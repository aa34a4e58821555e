package graft

import graft.operators.DBSCAN
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN post-conditions — reference test style #4 (SURVEY §5; the
  * reference asserts output count == input count, SpatialRDDTestCase:270-288)
  * plus semantic invariants of the clustering itself. */
class DBSCANSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def points = Tables.customerPts(spark, "/root/testdata/sf0.001")

  test("every input point gets exactly one label; clusters have >= minPts-consistent structure") {
    val pts = points
    val out = DBSCAN.cluster(pts, col("c_custkey"), col("cx"), col("cy"),
      eps = 32.0, minPts = 5).cache()
    assert(out.count() == pts.count())
    assert(out.select(col("id")).distinct().count() == pts.count())

    // each non-noise cluster contains its own id (min core id is a member)
    val bad = out.filter(col("cluster_id") >= 0)
      .groupBy(col("cluster_id")).agg(min(col("id")).as("min_id"))
      .filter(col("cluster_id") =!= col("min_id")).count()
    assert(bad == 0)
  }

  test("an integer id column is widened to long, same labels as the long run") {
    val pts = points
    val longRun = DBSCAN.cluster(pts, col("c_custkey"), col("cx"), col("cy"),
      eps = 32.0, minPts = 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val intRun = DBSCAN.cluster(pts.withColumn("ik", col("c_custkey").cast("int")),
      col("ik"), col("cx"), col("cy"), eps = 32.0, minPts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(intRun == longRun && intRun.nonEmpty)
  }

  test("noise points have no core neighbor; changing eps obeys monotonicity") {
    val pts = points.cache()
    val small = DBSCAN.cluster(pts, col("c_custkey"), col("cx"), col("cy"), 32.0, 5)
      .filter(col("cluster_id") >= 0).count()
    val large = DBSCAN.cluster(pts, col("c_custkey"), col("cx"), col("cy"), 40.0, 5)
      .filter(col("cluster_id") >= 0).count()
    // larger eps can only add clustered points (cores grow monotonically)
    assert(large >= small)
  }

  test("reference labeled_data fixture: perfect ground-truth recovery (their unfinished TODO)") {
    // the reference's SparkDBScanSpec runs eps=0.3/minPts=10 over
    // src/test/resources/labeled_data.csv but its result comparison is a
    // commented-out TODO (SparkDBScanSpec.scala:75-80 'requires a mapping
    // of cluster ids'). Completing it: each found cluster maps to exactly
    // one ground-truth label with ZERO impurities, and the whole labeling
    // is pinned (deterministic min-id cluster naming).
    import spark.implicits._
    val rows = scala.util.Using.resource(scala.io.Source.fromFile(
        "/root/reference/src/test/resources/labeled_data.csv"))(_.getLines().toSeq
      .zipWithIndex.map { case (l, i) =>
        val a = l.split(','); (i.toLong, a(0).toDouble, a(1).toDouble, a(2).toInt) })
    val df = rows.toDF("id", "x", "y", "label")
    val out = DBSCAN.cluster(df, col("id"), col("x"), col("y"), eps = 0.3, minPts = 10)
    val j = out.join(df, "id").select(col("cluster_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(j.count(_._1 == -1L) == 18) // sparse fringe = noise
    val byCluster = j.filter(_._1 != -1L).groupBy(_._1)
      .map { case (c, g) => (c, g.map(_._2).distinct.toSet, g.length) }
    // three clusters, each label-pure, sizes pinned
    assert(byCluster.toSet == Set((0L, Set(1), 243), (1L, Set(3), 243), (3L, Set(2), 245)))
  }

  test("all points in one dense blob form a single cluster") {
    import spark.implicits._
    val blob = (0 until 50).map(i => (i.toLong, (i % 7).toDouble, (i / 7).toDouble))
      .toDF("k", "x", "y")
    val out = DBSCAN.cluster(blob, col("k"), col("x"), col("y"), eps = 1.5, minPts = 3)
    assert(out.select(col("cluster_id")).distinct().count() == 1)
    assert(out.filter(col("cluster_id") === 0L).count() == 50)
  }
}
