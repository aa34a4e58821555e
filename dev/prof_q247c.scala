// q247 combined-fix candidate: feed-sized state partitions + tmpfs
// checkpoint + tighter poll. Compare against the current shape.
import org.apache.spark.sql.functions._
import graft._

locally {
  val dir = "/root/testdata/sf0.1"
  implicit val sqlCtx = spark.sqlContext
  val e = Tables.load(spark, dir, "events")
    .select(col("event_id"), col("user_id"),
      expr("ts div 1000000").as("etms"), col("event_type"))
  val clicks = e.filter(col("event_type") === "click")
    .select(col("event_id"), col("user_id"), col("etms")).collect()
    .map(r => (r.getLong(0), r.getLong(1), new java.sql.Timestamp(r.getLong(2))))
  val views = e.filter(col("event_type") === "view")
    .select(col("event_id"), col("user_id"), col("etms")).collect()
    .map(r => (r.getLong(0), r.getLong(1), new java.sql.Timestamp(r.getLong(2))))

  def run(tag: String, parts: Int, shmCkpt: Boolean, pollMs: Long): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    val delayMs = 60L * 24 * 3600 * 1000
    val maxMs = (clicks.iterator ++ views.iterator).map(_._3.getTime).max
    val sentinel = (-1L, -1L, new java.sql.Timestamp(maxMs + delayMs + 3600000L + 1000L))
    val lIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, java.sql.Timestamp)](
      org.apache.spark.sql.Encoders.product[(Long, Long, java.sql.Timestamp)], sqlCtx)
    val rIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, java.sql.Timestamp)](
      org.apache.spark.sql.Encoders.product[(Long, Long, java.sql.Timestamp)], sqlCtx)
    val out = graft.streaming.EventStreams.asOfStreamStream(
      lIn.toDF().toDF("id_a", "ua", "cts"), rIn.toDF().toDF("id_b", "ub", "vts"),
      "ua", "ub", "cts", "vts", maxLookbackMs = 3600000L,
      tieBreakColName = "id_b", watermarkDelay = s"$delayMs milliseconds",
      outer = false, emitMode = "final")
    val sink = "pc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val t0 = System.nanoTime()
    var w = out.writeStream.format("memory").queryName(sink).outputMode("append")
    val ckptDir = if (shmCkpt) { val d = s"/dev/shm/graft_ckpt_$sink"; w = w.option("checkpointLocation", d); d } else null
    val q = w.start()
    try {
      lIn.addData(clicks.toSeq); q.processAllAvailable()
      rIn.addData(views.toSeq); q.processAllAvailable()
      lIn.addData(sentinel); rIn.addData(sentinel); q.processAllAvailable()
      var stable = 0; var last = -1L; var polls = 0
      while (stable < 3 && polls < 300) {
        q.processAllAvailable()
        val n = spark.table(sink).count()
        if (n == last) stable += 1 else { stable = 0; last = n }
        polls += 1
        if (stable < 3) Thread.sleep(pollMs)
      }
      println(f"[prof] $tag%-24s total ${(System.nanoTime()-t0)/1e9}%.2f s rows=$last polls=$polls")
    } finally {
      q.stop()
      if (ckptDir != null)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptDir))
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
  run("warmup32", 32, false, 200)
  run("current(32,tmp,200)", 32, false, 200)
  run("parts10", 10, false, 200)
  run("parts10+shm", 10, true, 200)
  run("parts10+shm+poll50", 10, true, 50)
  run("parts10+shm+poll50 again", 10, true, 50)
  run("parts32+shm+poll50", 32, true, 50)
}
System.exit(0)
