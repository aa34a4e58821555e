// Sub-part profiler for q223_knn_join_invariants (optimization round 14).
// Mirrors the query body with timers around each action cluster.
// Run:
//   /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I dev/prof_q223.scala
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft._
import graft.operators.KNN
import graft.functions.stf

val dir = "/root/testdata/sf0.1"
def t[A](name: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
}

for (round <- 1 to 2) {
  println(s"=== round $round ===")
  val k = 5
  val sup = Tables.supplierPts(spark, dir)
  val cus = Tables.customerPts(spark, dir).select(col("c_custkey"), col("c_geo"))
  val out = t("knnJoin+checkpoint") {
    KNN.knnJoin(sup, cus, "s_geo", "c_geo", leftId = "s_suppkey",
      k = k, tieBreak = "c_custkey").localCheckpoint()
  }
  val nLeft = t("sup.count")(sup.count()); val nRight = t("cus.count")(cus.count())
  val kk = math.min(k.toLong, nRight)
  def allTrue(df: DataFrame, flag: Column): Boolean = {
    val r = df.agg(min(coalesce(flag, lit(false))), count(lit(1))).head()
    r.getLong(1) == 0L || r.getBoolean(0)
  }
  val perLeft = t("perLeft ckpt") {
    out.groupBy(col("s_suppkey")).agg(count(lit(1)).as("n")).localCheckpoint()
  }
  val cardinalityOk = t("cardinality") {
    perLeft.count() == nLeft && allTrue(perLeft, col("n") === kk)
  }
  val sig = out.groupBy(col("s_suppkey"), col("sx"), col("sy"))
    .agg(sort_array(collect_list(struct(col("knn_dist"), col("c_custkey")))).as("sig"))
  val coincidentOk = t("coincident") {
    allTrue(sig.groupBy(col("sx"), col("sy")).agg(countDistinct(col("sig")).as("nd")),
      col("nd") === 1)
  }
  val w = org.apache.spark.sql.expressions.Window
    .partitionBy(col("s_suppkey")).orderBy(col("knn_dist"), col("c_custkey"))
  val brute = sup.filter(col("s_suppkey") <= 100).crossJoin(cus)
    .withColumn("knn_dist", stf.st_centroid_distance(col("s_geo"), col("c_geo")))
    .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
    .select(col("s_suppkey"), col("c_custkey"), col("knn_dist"))
  val got = out.filter(col("s_suppkey") <= 100)
    .select(col("s_suppkey"), col("c_custkey"), col("knn_dist"))
  val sampleExactOk = t("exceptAll x2") {
    got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty
  }
  println(s"[prof] results: $cardinalityOk $coincidentOk $sampleExactOk")
}
System.exit(0)
