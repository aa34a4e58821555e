// Production-config sf1 lane for the verify-grade cosine-LSH monsters
// (round-13; r12 verdict ask #6): q111/q182/q205 dominate the sf1 sweep
// (950 s of 2,308 s) at the ORACLE-ANCHORING config (tables=48, planes=3,
// threshold=0.42 — sized so LSH recall is exact at a low threshold, which
// is what lets DuckDB verify them; that cost is harness cost, not the
// production design). q234 proved the auto-sized config (planes=0 ⇒ the
// measured log2 rule) reaches identical gate verdicts at a dedup-grade
// threshold (0.9) — hash-pinned at sf0.01/sf0.1/sf1. This script measures
// the PRODUCTION twins of all three lifecycle shapes at sf1: same
// store-lifecycle ops (one-pass build+gate / two-append ingest+gate /
// append+delete+compact+gate), auto planes, threshold 0.9.
// Run:
//   /opt/spark/bin/spark-shell --master "local[16]" --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=16 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I dev/coslsh_prod_lane.scala
import org.apache.spark.sql.functions._
def go(): Unit = {
  spark.sparkContext.setLogLevel("WARN")
  graft.functions.GraftFunctions.register(spark)
  val embs = spark.read.parquet("/tmp/graft_sf1/embeddings.parquet")
    .select(col("vec_id"), col("embedding")).localCheckpoint()
  def timed(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime
    val n = f
    println(f"[lane] $tag ${(System.nanoTime - t0) / 1e9}%.1f s kept=$n")
  }
  def rm(p: String): Unit = {
    def r(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(r)
      f.delete(); ()
    }
    r(new java.io.File(p))
  }
  // q111 twin: one-pass build + gate
  timed("q111_prod(build+gate)") {
    val p = "/tmp/lane_clstore"; rm(p)
    graft.operators.Dedup.buildCosineLshStore(embs.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), p, tables = 8, planes = 0)
    graft.operators.Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), p, threshold = 0.9).count()
  }
  // the ingest/compact flows start from an EMPTY store — nothing to
  // auto-size from — so production sizing is autoPlanes(expected rows),
  // the same rule planes=0 resolves on the one-pass build (train/add
  // contract: sizing is workload knowledge at init time)
  val prodPlanes = graft.operators.Dedup.autoPlanes(10000L)
  println(s"[lane] ingest lanes use planes=$prodPlanes = autoPlanes(10000)")
  // q182 twin: init + two appends + gate
  timed("q182_prod(ingest+gate)") {
    val p = "/tmp/lane_clingest"; rm(p)
    graft.operators.Dedup.initCosineLshStore(spark, p, tables = 8, planes = prodPlanes)
    graft.operators.Dedup.appendCosineLshBatch(embs.filter(col("vec_id") % 4 === 0),
      col("vec_id"), col("embedding"), p, batchId = 0L)
    graft.operators.Dedup.appendCosineLshBatch(embs.filter(col("vec_id") % 4 === 2),
      col("vec_id"), col("embedding"), p, batchId = 1L)
    graft.sources.Sidecar.markComplete(spark, p)
    graft.operators.Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), p, threshold = 0.9).count()
  }
  // q205 twin: append + delete + compact + gate
  timed("q205_prod(compact+gate)") {
    val p = "/tmp/lane_clcmp"; rm(p)
    graft.operators.Dedup.initCosineLshStore(spark, p, tables = 8, planes = prodPlanes)
    graft.operators.Dedup.appendCosineLshBatch(embs.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), p, batchId = 0L)
    graft.operators.Dedup.deleteFromCosineLshStore(
      embs.filter(col("vec_id") % 8 === 0).select(col("vec_id")),
      col("vec_id"), p, batchId = 0L)
    graft.operators.Dedup.compactCosineLshStore(spark, p)
    graft.sources.Sidecar.markComplete(spark, p)
    graft.operators.Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), p, threshold = 0.9).count()
  }
  // lifecycle-fold identity at the production config: the ingest store and
  // the compacted store serve the same gate verdicts as a one-pass build
  // over the same remaining corpus (the q182/q205 contracts, re-checked at
  // the auto config so the lane's numbers are for PROVEN-equivalent stores)
  val p1 = "/tmp/lane_fold1"; rm(p1)
  graft.operators.Dedup.buildCosineLshStore(
    embs.filter(col("vec_id") % 2 === 0),
    col("vec_id"), col("embedding"), p1, tables = 8, planes = prodPlanes)
  val g1 = graft.operators.Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
    col("vec_id"), col("embedding"), p1, threshold = 0.9)
    .select("vec_id").collect().map(_.getLong(0)).toSet
  val g2 = graft.operators.Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
    col("vec_id"), col("embedding"), "/tmp/lane_clingest", threshold = 0.9)
    .select("vec_id").collect().map(_.getLong(0)).toSet
  println(s"[lane] ingest-fold identity (q182 contract at auto config): ${g1 == g2}")
  val p2 = "/tmp/lane_fold2"; rm(p2)
  graft.operators.Dedup.buildCosineLshStore(
    embs.filter(col("vec_id") % 2 === 0 && col("vec_id") % 8 =!= 0),
    col("vec_id"), col("embedding"), p2, tables = 8, planes = prodPlanes)
  val g3 = graft.operators.Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
    col("vec_id"), col("embedding"), p2, threshold = 0.9)
    .select("vec_id").collect().map(_.getLong(0)).toSet
  val g4 = graft.operators.Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
    col("vec_id"), col("embedding"), "/tmp/lane_clcmp", threshold = 0.9)
    .select("vec_id").collect().map(_.getLong(0)).toSet
  println(s"[lane] compact-fold identity (q205 contract at auto config): ${g3 == g4}")
}
go()
System.exit(0)
