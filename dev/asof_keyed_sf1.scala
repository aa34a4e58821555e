// Keyed as-of join scaling measurement (round-12): the r11 audit rewrote
// the unkeyed asOf onto a density-independent carry-forward timeline
// (0.64 s sf0.01 -> 2.9 s sf1, sub-linear); this measures that the KEYED
// variant (asOfKeyed — per-user latest view before each click) inherits
// the property: same timeline kernel, key prepended to the range sort, so
// cost must stay ~n log n in TOTAL events at any per-key density. Run:
//   /opt/spark/bin/spark-shell --master "local[16]" --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=16 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I dev/asof_keyed_sf1.scala
// Measured 2026-08-16 (this host): see dev/sf1_sweep.md round-12 table.
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")
def time[T](tag: String)(f: => T): T = {
  val t0 = System.nanoTime; val r = f
  println(f"[asof] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
}
def run(dir: String, tag: String): Unit = {
  val e = graft.Tables.load(spark, dir, "events")
    .select(col("event_id"), col("user_id"), expr("ts div 1000").as("et"),
      col("event_type")).localCheckpoint()
  val clicks = e.filter(col("event_type") === "click")
    .select(col("event_id").as("id_a"), col("user_id").as("ua"), col("et").as("ta"))
  val views = e.filter(col("event_type") === "view")
    .select(col("event_id").as("id_b"), col("user_id").as("ub"), col("et").as("tb"))
  val nUnkeyed = time(s"$tag unkeyed q43 shape") {
    graft.operators.TemporalJoin.asOf(clicks, views, "id_a",
      col("ta"), col("tb"), 3600000000L, col("id_b")).count()
  }
  val nKeyed = time(s"$tag KEYED per-user") {
    graft.operators.TemporalJoin.asOfKeyed(clicks, views, "id_a",
      col("ua"), col("ub"), col("ta"), col("tb"), 3600000000L, col("id_b")).count()
  }
  println(s"[asof] $tag rows: unkeyed=$nUnkeyed keyed=$nKeyed")
}
run("/root/testdata/sf0.01", "sf0.01")
run("/root/testdata/sf0.1", "sf0.1")
run("/tmp/graft_sf1", "sf1")
System.exit(0)
