// Per-job duration dump for one query execution (optimization r14).
// Usage: env PROF_QUERY=<name> spark-shell ... -I dev/prof_jobs.scala
import org.apache.spark.scheduler._
import graft._

locally {
  val dir = "/root/testdata/sf0.1"
  val qname = sys.env.getOrElse("PROF_QUERY", "q230_dbscan_dims64")
  val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String)]()
  val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
      val site = j.stageInfos.map(s => s.name.take(60)).mkString(" | ")
      val nTasks = j.stageInfos.map(_.numTasks).sum
      starts.put(j.jobId, (j.time, s"tasks=$nTasks :: " + (if (desc.nonEmpty) desc else site)))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val s = starts.get(j.jobId)
      if (s != null) jobs.synchronized { jobs += ((j.jobId, s._1, j.time - s._1, s._2)) }
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
      if (dur > 0.3) println(f"[prof] STAGE ${i.stageId}%4d $dur%7.3f s tasks=${i.numTasks} ${i.name.take(70)}")
    }
  })
  // warm once, then measure
  for (round <- 1 to 2) {
    jobs.synchronized { jobs.clear() }
    val t0 = System.nanoTime()
    SparkEntry.queries(qname)(spark, dir).queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[prof] === $qname round $round total $dt%.2f s, ${jobs.size} jobs ===")
    jobs.synchronized {
      jobs.sortBy(_._2).foreach { case (id, _, dur, site) =>
        println(f"[prof] job $id%3d ${dur/1000.0}%7.3f s  $site")
      }
    }
  }
}
System.exit(0)
