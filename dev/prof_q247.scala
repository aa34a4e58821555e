// Phase profiler for q244/q247 (stream-stream as-of) — optimization r14.
// Run:
//   /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I dev/prof_q247.scala
import org.apache.spark.sql.functions._
import graft._

val dir = "/root/testdata/sf0.1"
def t[A](name: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
}
implicit val sqlCtx = spark.sqlContext
import spark.implicits._

for (round <- 1 to 2) {
  println(s"=== q247 round $round ===")
  val e = Tables.load(spark, dir, "events")
    .select(col("event_id"), col("user_id"),
      expr("ts div 1000000").as("etms"), col("event_type"))
  val clicks = t("collect clicks") { e.filter(col("event_type") === "click")
    .select(col("event_id"), col("user_id"), col("etms")).collect()
    .map(r => (r.getLong(0), r.getLong(1), new java.sql.Timestamp(r.getLong(2)))) }
  val views = t("collect views") { e.filter(col("event_type") === "view")
    .select(col("event_id"), col("user_id"), col("etms")).collect()
    .map(r => (r.getLong(0), r.getLong(1), new java.sql.Timestamp(r.getLong(2)))) }
  println(s"[prof] clicks=${clicks.length} views=${views.length}")
  val delayMs = 60L * 24 * 3600 * 1000
  val maxMs = (clicks.iterator ++ views.iterator).map(_._3.getTime).max
  val sentinel = (-1L, -1L, new java.sql.Timestamp(maxMs + delayMs + 3600000L + 1000L))
  val lIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, java.sql.Timestamp)]
  val rIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, java.sql.Timestamp)]
  val out = graft.streaming.EventStreams.asOfStreamStream(
    lIn.toDF().toDF("id_a", "ua", "cts"), rIn.toDF().toDF("id_b", "ub", "vts"),
    "ua", "ub", "cts", "vts", maxLookbackMs = 3600000L,
    tieBreakColName = "id_b", watermarkDelay = s"$delayMs milliseconds",
    outer = false, emitMode = "final")
  val sink = "p247_" + round + "_" + java.util.UUID.randomUUID().toString.replace("-", "")
  val q = t("stream start") { out.writeStream.format("memory").queryName(sink)
    .outputMode("append").start() }
  try {
    t("B1 lefts") { lIn.addData(clicks.toSeq); q.processAllAvailable() }
    t("B2 rights") { rIn.addData(views.toSeq); q.processAllAvailable() }
    t("B3 sentinel") { lIn.addData(sentinel); rIn.addData(sentinel); q.processAllAvailable() }
    t("poll loop") {
      var stable = 0; var last = -1L; var polls = 0
      while (stable < 3 && polls < 150) {
        q.processAllAvailable()
        val n = spark.table(sink).count()
        if (n == last) stable += 1 else { stable = 0; last = n }
        polls += 1
        if (stable < 3) Thread.sleep(200)
      }
      println(s"[prof] polls=$polls rows=$last")
    }
  } finally t("stop")(q.stop())
  t("read sink")(spark.table(sink).select(col("id_a"), col("id_b")).orderBy(col("id_a")).queryExecution.toRdd.count())
}
System.exit(0)
