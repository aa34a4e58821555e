package graft

import graft.functions.stf
import graft.operators.JoinPredicate
import graft.syntax._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fluent API produces the same results as the operator objects. */
class SyntaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fluent chain: filter -> knn matches direct operators") {
    val c = Tables.customerPts(spark, dir)
    val poly = stf.st_geomfromwkt("POLYGON ((100 100, 600 100, 600 700, 100 700, 100 100))")
    val fluent = c.stContainedBy(col("c_geo"), poly)
      .stKnn(col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), k = 5)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val direct = graft.operators.KNN.knn(
        graft.operators.SpatialOps.containedBy(c, col("c_geo"), poly),
        col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), 5)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(fluent == direct && fluent.size == 5)
  }

  test("round-3 fluent surface: indexed join, raster filter, temporal overlap") {
    val n = Tables.nationRects(spark, dir)
    val c = Tables.customerPts(spark, dir)
    val viaIdx = n.stJoinIndexed(c, "n_geo", "c_geo", JoinPredicate.Contains, 100.0)
      .select("n_nationkey", "c_custkey").collect()
      .map(r => (r.get(0), r.get(1))).toSet
    val direct = n.stJoin(c, col("n_geo"), col("c_geo"), JoinPredicate.Contains, 100.0)
      .select("n_nationkey", "c_custkey").collect()
      .map(r => (r.get(0), r.get(1))).toSet
    assert(viaIdx == direct && direct.nonEmpty)

    val tiles = Tables.eventPts(spark, dir).stRasterize(col("ex"), col("ey"), 10.0, 10, 10)
    assert(tiles.stRasterFilter(
      stf.st_geomfromwkt("POLYGON ((0 0, 375 0, 0 375, 0 0))"), default = -1L).count() > 0)
    assert(tiles.stBucketHistogram(4).count() == 4)

    val e = Tables.load(spark, dir, "events")
      .select(col("event_id"), expr("ts div 1000").as("et")).limit(100)
    val iv = e.select(col("event_id").as("id_a"), col("et").as("sa"),
      (col("et") + 60000000L).as("ea"))
    val iv2 = iv.select(col("id_a").as("id_b"), col("sa").as("sb"), col("ea").as("eb"))
    assert(iv.stTemporalOverlapJoin(iv2, col("sa"), col("ea"), col("sb"), col("eb"),
      bucket = 120000000L).count() >= 100) // at least the self-pairs
  }

  test("fluent join and cluster run end-to-end") {
    val n = Tables.nationRects(spark, dir)
    val c = Tables.customerPts(spark, dir)
    val joined = n.stJoin(c, col("n_geo"), col("c_geo"), JoinPredicate.Contains, 100.0)
    assert(joined.count() > 0)
    val clustered = c.stCluster(col("c_custkey"), col("cx"), col("cy"), 32.0, 5)
    assert(clustered.count() == c.count())
  }

  test("round-5 fluent surface: quantile gate, dup spans, span store, dup rate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val q = graft.operators.TextAnalysis.withQuality(docs, col("text"))
    val gated = q.quantileGate(col("source"), 1, 4, col("quality_e6").desc, col("doc_id"))
    assert(gated.count() ==
      graft.operators.Pipeline.quantileGate(q, col("source"), 1, 4,
        col("quality_e6").desc, col("doc_id")).count())
    val spans = docs.withDuplicatedSpans(col("doc_id"), col("text"), k = 5)
    assert(spans.count() == docs.count())
    val rates = docs.dupRateByGroup(col("source"), md5(col("text").cast("binary")))
    assert(rates.count() == 20)
    val path = java.nio.file.Files.createTempDirectory("graft_syntax_spans").toString
    graft.operators.Dedup.buildSpanStore(docs.limit(100), col("text"), 5, path)
    assert(docs.dropSeenSpans(col("doc_id"), col("text"), 5, path).count() <= docs.count())
  }
}
