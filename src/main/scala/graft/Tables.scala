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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts arrives as TIMESTAMP_NTZ under Spark 4.x (the parquet
    // column is a plain timestamp); every downstream site expects the
    // historical epoch-nanosecond LONG (`ts div 1000` -> micros, matching
    // the DuckDB oracle's epoch_ns(ts)//1000). Normalize here, once, with
    // wall-clock NTZ arithmetic — timestampdiff on NTZ has no session-
    // timezone dependence, so the value is exact regardless of JVM TZ.
    // Sub-microsecond precision: the driver data is micros-exact, and the
    // oracle floors, so micros*1000 is the identical nanosecond value.
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) * 1000"))
      case _ => df // already a LONG (older readers) or no ts column
    }
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
   * ey=(event_id*23)%500, instant = ts nanos div 1000 (micros). `ts` is
   * normalized to a nanosecond LONG by [[load]]; integer division keeps it
   * exact — DuckDB side uses epoch_ns(ts)//1000, identical for positives.
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
