package graft

import graft.functions.stf
import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q6_spatial_join")(spark, "/root/testdata/sf0.001")

  // time window for the temporal filter: [2024-01-10, 2024-01-20] in epoch micros
  private val T1 = 1704844800000000L
  private val T2 = 1705708800000000L

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Generic relational baseline (Spark built-ins; SURVEY §2.5 note).
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // σ st_containedby(point, polygon) — SURVEY §2.2 `rdd.containedby`.
    "q2_filter_containedby" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      SpatialOps.containedBy(c, col("c_geo"),
          stf.st_geomfromwkt("POLYGON ((100 100, 600 100, 600 700, 100 700, 100 100))"))
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // σ st_intersects with BOTH space and time — SURVEY §2.2 semantics.
    "q3_filter_intersects_time" -> ((s, dir) => {
      val e = Tables.eventPts(s, dir)
      val qry = stf.st_with_time(
        stf.st_geomfromwkt("POLYGON ((0 0, 250 0, 250 250, 0 250, 0 0))"),
        lit(T1), lit(T2))
      SpatialOps.intersects(e, col("e_geo"), qry)
        .select(col("event_id")).orderBy(col("event_id"))
    }),

    // within-distance join — SURVEY §2.2 withinDistance as a join.
    "q4_distance_join" -> ((s, dir) => {
      val sup = Tables.supplierPts(s, dir)
      val cus = Tables.customerPts(s, dir)
      SpatialJoin.distanceJoin(sup, cus, col("s_geo"), col("c_geo"),
          maxDist = 50.5, cellSize = 100.0)
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    // global kNN — SURVEY §2.5 kNN family (one query covers kNN/knnTake/knnAgg).
    "q5_knn" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      KNN.knn(c, col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), 20,
          tieBreak = Seq(col("c_custkey")))
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // cell-replicate spatial join — SURVEY §2.3 `join(other, CONTAINS)`.
    "q6_spatial_join" -> ((s, dir) => {
      val n = Tables.nationRects(s, dir)
      val c = Tables.customerPts(s, dir)
      SpatialJoin.join(n, c, col("n_geo"), col("c_geo"),
          JoinPredicate.Contains, cellSize = 100.0)
        .select(col("n_nationkey"), col("c_custkey"))
        .orderBy(col("n_nationkey"), col("c_custkey"))
    }),

    // kNN join (global k, deterministic ties) — SURVEY §2.3 knnJoin.
    "q7_knn_join" -> ((s, dir) => {
      val sup = Tables.supplierPts(s, dir)
      val cus = Tables.customerPts(s, dir).select("c_custkey", "c_geo")
      KNN.knnJoin(sup, cus, "s_geo", "c_geo", k = 5, tieBreak = "c_custkey")
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    // 2-d skyline — SURVEY §2.5 skyline family.
    "q8_skyline" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      Skyline.skyline(c, "cx", "cy")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
       "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents, " +
       "count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus " +
       "ORDER BY l_returnflag, l_linestatus"),

    "q2_filter_containedby" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT c_custkey FROM cpts WHERE cx > 100 AND cx < 600 AND cy > 100 AND cy < 700 " +
       "ORDER BY c_custkey"),

    "q3_filter_intersects_time" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       s"SELECT event_id FROM epts WHERE ex <= 250 AND ey <= 250 " +
       s"AND et >= $T1 AND et <= $T2 ORDER BY event_id"),

    "q4_distance_join" ->
      (s"WITH spts AS (${Tables.supplierPtsSql}), cpts AS (${Tables.customerPtsSql}) " +
       "SELECT s_suppkey, c_custkey FROM spts, cpts " +
       "WHERE sqrt((sx-cx)*(sx-cx)+(sy-cy)*(sy-cy)) <= 50.5 " +
       "ORDER BY s_suppkey, c_custkey"),

    "q5_knn" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT c_custkey FROM (SELECT c_custkey FROM cpts " +
       "ORDER BY sqrt((cx-500)*(cx-500)+(cy-500)*(cy-500)), c_custkey LIMIT 20) " +
       "ORDER BY c_custkey"),

    "q6_spatial_join" ->
      (s"WITH nrect AS (${Tables.nationRectsSql}), cpts AS (${Tables.customerPtsSql}) " +
       "SELECT n_nationkey, c_custkey FROM nrect, cpts " +
       "WHERE cx > nx AND cx < nx+150 AND cy > ny AND cy < ny+150 " +
       "ORDER BY n_nationkey, c_custkey"),

    "q7_knn_join" ->
      (s"WITH spts AS (${Tables.supplierPtsSql}), cpts AS (${Tables.customerPtsSql}) " +
       "SELECT s_suppkey, c_custkey FROM (" +
       "SELECT s_suppkey, c_custkey, row_number() OVER (PARTITION BY s_suppkey " +
       "ORDER BY sqrt((sx-cx)*(sx-cx)+(sy-cy)*(sy-cy)), c_custkey) AS rn FROM spts, cpts) " +
       "WHERE rn <= 5 ORDER BY s_suppkey, c_custkey"),

    "q8_skyline" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT c_custkey FROM cpts a WHERE NOT EXISTS (" +
       "SELECT 1 FROM cpts b WHERE (b.cx <= a.cx AND b.cy < a.cy) " +
       "OR (b.cx < a.cx AND b.cy <= a.cy)) ORDER BY c_custkey")
  )
}
