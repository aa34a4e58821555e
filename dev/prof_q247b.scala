// q247 diagnostic: per-batch durationMs breakdown + state partition sweep.
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

  def run(parts: Int): Unit = {
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
    val sink = "pb_" + parts + "_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val t0 = System.nanoTime()
    val q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      lIn.addData(clicks.toSeq); q.processAllAvailable()
      rIn.addData(views.toSeq); q.processAllAvailable()
      lIn.addData(sentinel); rIn.addData(sentinel); q.processAllAvailable()
      var stable = 0; var last = -1L; var polls = 0
      while (stable < 3 && polls < 150) {
        q.processAllAvailable()
        val n = spark.table(sink).count()
        if (n == last) stable += 1 else { stable = 0; last = n }
        polls += 1
        if (stable < 3) Thread.sleep(200)
      }
      println(f"[prof] parts=$parts total ${(System.nanoTime()-t0)/1e9}%.2f s rows=$last polls=$polls")
      q.recentProgress.foreach { p =>
        println(s"[prof]   batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs} state=${p.stateOperators.map(s => s"rows=${s.numRowsTotal} updated=${s.numRowsUpdated} commit=${s.commitTimeMs}ms").mkString}")
      }
    } finally q.stop()
  }
  run(32); run(32); run(8); run(4)
}
System.exit(0)
