package graft

import graft.functions.{GraftFunctions, stf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling scratch — not committed
object Prof {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    import graft.operators._

    val e = Tables.load(spark, dir, "embeddings")
    println("dim=" + e.select(size(col("embedding"))).head().getInt(0))
    val exact = time("exact pairs") {
      Dedup.cosinePairsExact(e, col("vec_id"), col("embedding"), 0.42)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(s"exact=${exact.size}")
    for ((t, p) <- Seq((48, 3), (168, 6))) {
      Dedup.cosinePairsLsh(e, col("vec_id"), col("embedding"), 0.42, t, p).count()
      val got = time(s"lsh refine-first t=$t p=$p") {
        Dedup.cosinePairsLsh(e, col("vec_id"), col("embedding"), 0.42, t, p)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      println(s"  t=$t p=$p pairs=${got.size} missed=${(exact -- got).size} extra=${(got -- exact).size}")
    }
    spark.stop()
  }
}
