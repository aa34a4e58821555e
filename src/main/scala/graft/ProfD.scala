package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object ProfD {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val pts0 = Tables.customerPts(spark, "/root/testdata/sf0.1")
    t("warmup")(pts0.count())
    val eps = 32.0; val minPts = 5; val eps2 = eps*eps
    val pts = pts0.select(col("c_custkey").as("__id"), col("cx").as("__x"), col("cy").as("__y"))
    def cellOf(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column, dx: Int, dy: Int) =
      (floor(x / eps).cast("long") + dx) * 4294967296L + (floor(y / eps).cast("long") + dy)
    val owned = pts.withColumn("__cell", cellOf(col("__x"), col("__y"), 0, 0))
    val halo = pts.withColumn("__cell", explode(array(
      (for (dx <- -1 to 1; dy <- -1 to 1) yield cellOf(col("__x"), col("__y"), dx, dy)): _*)))
    val nbr = owned.as("l").join(halo.as("r"), col("l.__cell") === col("r.__cell"))
      .filter((col("l.__x")-col("r.__x"))*(col("l.__x")-col("r.__x")) +
              (col("l.__y")-col("r.__y"))*(col("l.__y")-col("r.__y")) <= eps2)
      .select(col("l.__id").as("__a"), col("r.__id").as("__b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("nbr pairs")(println("pairs=" + nbr.count()))
    val core = nbr.groupBy(col("__a")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minPts).select(col("__a").as("__id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("core")(println("cores=" + core.count()))
    val coreEdges = nbr.join(core.withColumnRenamed("__id","__a"), "__a")
      .join(core.withColumnRenamed("__id","__b"), "__b")
      .select(col("__a"), col("__b")).persist(StorageLevel.MEMORY_AND_DISK)
    t("coreEdges")(println("edges=" + coreEdges.count()))
    import org.apache.spark.graphx.Graph
    val edgeRdd = coreEdges.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val cc = t("graphx cc")(Graph.fromEdgeTuples(edgeRdd, 0).connectedComponents(25).vertices.count())
    spark.stop()
  }
}
