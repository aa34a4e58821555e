package graft

import graft.functions.{GraftFunctions, stf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Test-table loaders + the deterministic derived geometry columns used by the
 * driver-checked queries. The same arithmetic appears verbatim in the DuckDB
 * oracle SQL (SparkEntry.oracleSql), so both engines derive identical
 * coordinates from the shared parquet tables. Integer-valued doubles keep
 * every comparison exact.
 */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftFunctions.register(spark)
    // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark rejects;
    // read it as a raw nanosecond LONG instead (exact, no tz interpretation).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** customer as points: cx=(c_custkey*17)%1000, cy=(c_custkey*31)%1000. */
  def customerPts(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .withColumn("cx", (col("c_custkey") * 17 % 1000).cast("double"))
      .withColumn("cy", (col("c_custkey") * 31 % 1000).cast("double"))
      .withColumn("c_geo", stf.st_point(col("cx"), col("cy")))

  /** SQL CTE equivalent of [[customerPts]]. */
  val customerPtsSql: String =
    "SELECT c_custkey, CAST((c_custkey*17)%1000 AS DOUBLE) AS cx, " +
    "CAST((c_custkey*31)%1000 AS DOUBLE) AS cy FROM customer"

  /** supplier as points: sx=(s_suppkey*13)%1000, sy=(s_suppkey*7)%1000. */
  def supplierPts(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "supplier")
      .withColumn("sx", (col("s_suppkey") * 13 % 1000).cast("double"))
      .withColumn("sy", (col("s_suppkey") * 7 % 1000).cast("double"))
      .withColumn("s_geo", stf.st_point(col("sx"), col("sy")))

  val supplierPtsSql: String =
    "SELECT s_suppkey, CAST((s_suppkey*13)%1000 AS DOUBLE) AS sx, " +
    "CAST((s_suppkey*7)%1000 AS DOUBLE) AS sy FROM supplier"

  /** nation as 150x150 rectangles anchored at ((n*37)%800, (n*53)%800). */
  def nationRects(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "nation")
      .withColumn("nx", (col("n_nationkey") * 37 % 800).cast("double"))
      .withColumn("ny", (col("n_nationkey") * 53 % 800).cast("double"))
      .withColumn("n_geo", stf.st_box(col("nx"), col("ny"), col("nx") + 150, col("ny") + 150))

  val nationRectsSql: String =
    "SELECT n_nationkey, CAST((n_nationkey*37)%800 AS DOUBLE) AS nx, " +
    "CAST((n_nationkey*53)%800 AS DOUBLE) AS ny FROM nation"

  /**
   * events as spatio-temporal points: ex=(event_id*19)%500,
   * ey=(event_id*23)%500, instant = ts nanos div 1000 (micros). `ts` arrives
   * as a nanosecond LONG (nanosAsLong); integer division keeps it exact —
   * DuckDB side uses epoch_ns(ts)//1000, identical for positive values.
   */
  def eventPts(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ex", (col("event_id") * 19 % 500).cast("double"))
      .withColumn("ey", (col("event_id") * 23 % 500).cast("double"))
      .withColumn("e_geo", stf.st_with_instant(
        stf.st_point(col("ex"), col("ey")), expr("ts div 1000")))

  val eventPtsSql: String =
    "SELECT event_id, CAST((event_id*19)%500 AS DOUBLE) AS ex, " +
    "CAST((event_id*23)%500 AS DOUBLE) AS ey, epoch_ns(ts)//1000 AS et FROM events"
}
