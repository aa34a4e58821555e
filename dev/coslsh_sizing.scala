// Cosine-LSH sizing-rule measurement (round-11 scaling audit):
// the q111/q182/q205 sf1 rows run the oracle-anchoring 48-tables/3-planes
// config whose candidate set is ~all pairs BY DESIGN; this script measures
// the documented production sizing rule (planes ~ log2(store/width)) on
// the same sf1 embeddings at a dedup-grade threshold. Run:
//   /opt/spark/bin/spark-shell --master "local[16]" --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=16 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I dev/coslsh_sizing.scala
// Measured 2026-08-16: planes=10/tables=8 -> build 3.7 s, gate 13.2 s;
// planes=3/tables=48 -> build 1.1 s, gate 270.6 s; IDENTICAL verdicts
// (7,510 of 10,000 kept; the hot cluster batch half dropped) — 20x.

import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")
val e = spark.read.parquet("/tmp/graft_sf1/embeddings.parquet").localCheckpoint()
val store = e.filter(col("vec_id") % 2 === 0)
val batch = e.filter(col("vec_id") % 2 =!= 0)
def time[T](tag: String)(f: => T): T = {
  val t0 = System.nanoTime; val r = f
  println(f"[sizing] $tag: ${(System.nanoTime - t0) / 1e9}%.1f s"); r
}
// production-sized per the documented rule: planes ~ log2(store/width)
// = log2(10000/16) ~ 10, dedup-grade threshold 0.9
val p10 = "/tmp/coslsh_sizing/p10"
time("build planes=10 tables=8") {
  graft.operators.Dedup.buildCosineLshStore(store, col("vec_id"), col("embedding"), p10, tables = 8, planes = 10)
}
val kept10 = time("gate planes=10 theta=0.9") {
  graft.operators.Dedup.dropSeenCosine(batch, col("vec_id"), col("embedding"), p10, threshold = 0.9).count()
}
println(s"[sizing] kept $kept10 of ${batch.count()} batch rows (hot-cluster rows dropped)")
// the oracle-anchoring config at the same threshold, for an apples-to-
// apples cost comparison on the SAME verdicts
val p3 = "/tmp/coslsh_sizing/p3"
time("build planes=3 tables=48") {
  graft.operators.Dedup.buildCosineLshStore(store, col("vec_id"), col("embedding"), p3, tables = 48, planes = 3)
}
val kept3 = time("gate planes=3 theta=0.9") {
  graft.operators.Dedup.dropSeenCosine(batch, col("vec_id"), col("embedding"), p3, threshold = 0.9).count()
}
println(s"[sizing] 48/3 kept $kept3")
System.exit(0)
