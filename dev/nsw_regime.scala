// IVF-NSW production-regime measurement (round-12; r11 verdict ask #2):
// q232 pins recall/visited in the DEGENERATE regime (sf0.01, 8 cells of
// ~60 vectors — the beam must visit ~half of every probed cell). The
// regime the graph tier exists for is big cells (sf1: nlist=16 over 20k
// vectors = ~1250/cell), where the beam's visited fraction collapses.
// This script measures BOTH with the engine itself (not NumPy):
//   - one deliberate big cell (nlist=1) at sf0.01/sf0.1 — the q235 shape
//   - sf1-scale cells (nlist=16, 20k vectors) — the production claim
// Run:
//   /opt/spark/bin/spark-shell --master "local[16]" --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=16 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I dev/nsw_regime.scala
// Measured 2026-08-16 (this host): see SCALE.md "IVF-NSW regimes" table.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
spark.sparkContext.setLogLevel("WARN")
graft.functions.GraftFunctions.register(spark)
def measure(dir: String, tag: String, nlist: Int, nprobe: Int, ef: Int): Unit = {
  val e = spark.read.parquet(dir + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding")).localCheckpoint()
  val n = e.count()
  val path = s"/tmp/nsw_regime_${tag}_$nlist"
  val t0 = System.nanoTime
  graft.operators.Similarity.buildNswIndex(e, path, col("vec_id"),
    col("embedding"), nlist = nlist, m = 8, efC = 32)
  val tb = (System.nanoTime - t0) / 1e9
  val q = e.filter(col("vec_id") < 20)
  val approx = graft.operators.Similarity.nswTopKIndexed(q, path,
    col("vec_id"), col("embedding"), k = 10, nprobe = nprobe, efSearch = ef)
  val d2 = graft.functions.stf.vec_dist2(col("q.embedding"), col("c.embedding"))
  val exact = q.as("q").crossJoin(e.as("c"))
    .filter(col("c.vec_id") =!= col("q.vec_id"))
    .withColumn("rank", row_number().over(
      Window.partitionBy(col("q.vec_id")).orderBy(d2, col("c.vec_id"))))
    .filter(col("rank") <= 10)
    .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
  val hits = approx.select(col("query_id"), col("neighbor_id")).intersect(exact).count()
  val recall = hits.toDouble / exact.count()
  val visited = graft.operators.Similarity.nswProbeStats(q, path,
      col("vec_id"), col("embedding"), nprobe = nprobe, efSearch = ef)
    .agg(avg(col("n_visited"))).collect()(0).getDouble(0)
  println(f"[nsw] $tag n=$n nlist=$nlist nprobe=$nprobe ef=$ef build=$tb%.1fs " +
    f"recall@10=$recall%.3f avg_visited=$visited%.0f frac=${visited / n}%.3f")
}
// deliberate big cell: the whole corpus as ONE graph (the q235 shape)
measure("/root/testdata/sf0.01", "sf0.01-bigcell", nlist = 1, nprobe = 1, ef = 64)
measure("/root/testdata/sf0.1", "sf0.1-bigcell", nlist = 1, nprobe = 1, ef = 64)
// production-scale cells at sf1: 20k vectors / 16 cells ~ 1250 per cell
measure("/tmp/graft_sf1", "sf1", nlist = 16, nprobe = 4, ef = 64)
// and the q232 configuration itself at sf1-scale cells for the direct line
measure("/tmp/graft_sf1", "sf1-ncell8", nlist = 8, nprobe = 4, ef = 64)
System.exit(0)
