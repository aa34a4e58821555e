// Conf sensitivity sweep for one query (diagnostic only).
import graft._

locally {
  val dir = "/root/testdata/sf0.1"
  val qname = sys.env.getOrElse("PROF_QUERY", "q230_dbscan_dims64")
  def run(tag: String): Unit = {
    val t0 = System.nanoTime()
    SparkEntry.queries(qname)(spark, dir).queryExecution.toRdd.count()
    println(f"[prof] $tag%-44s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    try spark.sharedState.cacheManager.clearCache() catch { case _: Throwable => }
    try spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false)) catch { case _: Throwable => }
  }
  run("warmup"); run("default"); run("default again")
  spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
  run("coalesce off"); run("coalesce off again")
  spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16kb")
  run("minPartitionSize=16kb"); run("minPartitionSize=16kb again")
  spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionSize")
  spark.conf.set("spark.sql.adaptive.enabled", "false")
  run("AQE off"); run("AQE off again")
  spark.conf.set("spark.sql.adaptive.enabled", "true")
}
System.exit(0)
