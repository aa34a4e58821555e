// Warm per-query timing: runs each query twice, reports both (min ~ bench).
// PROF_QUERIES=comma,separated spark-shell ... -I dev/prof_multi.scala
import graft._

locally {
  val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.1")
  val names = sys.env.getOrElse("PROF_QUERIES", "q1_agg").split(",").toSeq
  // global warmup
  SparkEntry.queries.head._2(spark, dir).queryExecution.toRdd.count()
  names.foreach { n =>
    val reps = sys.env.getOrElse("PROF_REPS", "2").toInt
    val dts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      try spark.sharedState.cacheManager.clearCache() catch { case _: Throwable => }
      try spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false)) catch { case _: Throwable => }
      dt
    }
    println(f"[prof] $n%-32s " + dts.map(d => f"$d%6.2f").mkString(" ") + f" min=${dts.min}%7.2f")
  }
}
System.exit(0)
