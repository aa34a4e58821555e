package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Behavioral event analytics over (key, time, type) streams — funnels and
 * retention cohorts, the companions of [[TemporalJoin.sessionize]]. The
 * reference has no event-sequence surface; these are first-class here
 * because the same engine that curates a training corpus also reads the
 * product telemetry that motivates it, and both ops are classic "must not
 * collect to the driver" patterns.
 *
 * Both are integer-exact and deterministic (ties resolved by an explicit
 * tie-break column), so external SQL engines replay them bit-for-bit.
 */
object EventAnalytics {

  /**
   * Funnel analysis: for each key, the greedy in-order completion of the
   * `stages` event-type sequence — stage i's time is the FIRST event of
   * type `stages(i)` after stage i−1's event in (time, tieBreak) order.
   * Greedy-earliest is the standard funnel semantics, and it is optimal:
   * taking the earliest qualifying event at every stage can never prevent
   * a completion another matching would allow.
   *
   * Returns one row per key: `reached` (stages completed, 0..k) and
   * `stage_times` (array of the completed stages' event times, in stage
   * order).
   *
   * Plan shape: the per-key event list is collected and sorted INSIDE the
   * aggregation (`collect_list` + `sort_array`) and folded by a single
   * `aggregate` lambda — state is one array per key, bounded by that
   * key's event count, the same per-entity contract as
   * [[TemporalJoin.sessionize]]; nothing leaves the executors. Events of
   * types outside `stages` are filtered before the collect, so the list
   * holds only potential stage hits.
   */
  def funnel(df: DataFrame, keyCol: Column, tsCol: Column, tieBreak: Column,
             typeCol: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages — a repeated stage type would " +
      "greedily re-match the same semantic step")
    val stagesArr = array(stages.map(lit): _*)
    df.filter(typeCol.isin(stages: _*))
      .select(keyCol.as("key"),
        struct(tsCol.cast("long").as("t"), tieBreak.cast("long").as("tb"),
          typeCol.as("s")).as("__ev"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(col("__ev"))).as("__evs"))
      .withColumn("stage_times",
        aggregate(col("__evs"),
          lit(Array.empty[Long]),
          (acc, e) => when(
            size(acc) < stages.size &&
            e.getField("s") === element_at(stagesArr, size(acc) + 1),
            concat(acc, array(e.getField("t")))).otherwise(acc)))
      .withColumn("reached", size(col("stage_times")))
      .select(col("key"), col("reached"), col("stage_times"))
  }

  /**
   * Trailing-window features: for every event, the count and e6-scaled
   * sum of the SAME key's events in the closed time window
   * [t − horizon, t] — the sliding-window feature extraction pass
   * (per-user rates, rolling spend, request-burst detection) — plus an
   * integer-exact spike flag: `spike` ⇔ value·cnt > factor·sum, i.e. the
   * current value exceeds `factor`× the trailing mean, cross-multiplied
   * so no division or float ever enters the comparison.
   *
   * One RANGE window per key (frame bounds by time VALUE, so simultaneous
   * events see each other symmetrically — deterministic without a tie
   * order). `valueE6Col` must already be integer (floor the e6 scaling at
   * the call site so the cast rule of the replaying engine cannot differ).
   */
  def withTrailingStats(df: DataFrame, keyCol: Column, tsCol: Column,
                        valueE6Col: Column, horizon: Long,
                        spikeFactor: Long = 2L): DataFrame = {
    require(horizon > 0, s"horizon must be positive, got $horizon")
    require(!df.columns.exists(c => c.equalsIgnoreCase("trail_cnt") ||
      c.equalsIgnoreCase("trail_sum_e6") || c.equalsIgnoreCase("spike")),
      "withTrailingStats: input must not contain trail_cnt/trail_sum_e6/spike " +
      "columns (an earlier horizon's features would be silently replaced)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(tsCol.cast("long"))
      .rangeBetween(-horizon, 0)
    df.withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("trail_sum_e6", sum(valueE6Col).over(w).cast("long"))
      .withColumn("spike",
        valueE6Col * col("trail_cnt") > lit(spikeFactor) * col("trail_sum_e6"))
  }

  /**
   * Retention cohort matrix: keys are cohorted by the time bucket of
   * their FIRST event; each (cohort, age) cell counts the distinct keys
   * from that cohort active `age` buckets later — the table behind every
   * retention curve.
   *
   * Two aggregations (first-bucket per key, then distinct keys per cell)
   * plus one join keyed by the entity key — all shuffles carry the key,
   * the exact-distinct count is per (cohort, age) cell over pre-deduped
   * (cell, key) rows, so no cell ever sees more than its cohort's keys.
   */
  /**
   * Exponentially time-decayed event counts with an EXACT integer decay —
   * the trending-keys telemetry signal: each event contributes
   * `1e6 >> min((now − ts) div halfLifeNs, 40)` (one halving per whole
   * elapsed half-life, zero past 40 — the e6 weight is exhausted), and
   * the per-key sum is the decayed score. The staircase decay brackets
   * the smooth 2^(−age/h) within one halving step, and every quantity is
   * an integer, so any SQL engine replays scores bit-for-bit — the house
   * alternative to float EWMA scores that can never be hash-verified.
   *
   * `now` defaults to the in-plan `max(ts)` (one broadcast scalar row —
   * the BM25-stats shape); pass a literal for serving-time decay against
   * a wall clock. Events after `now` clamp to age 0 (full weight).
   * Output: (key, n_events, decayed_e6).
   */
  def decayedCounts(df: DataFrame, keyCol: Column, tsCol: Column,
                    halfLifeNs: Long, now: Column = null): DataFrame = {
    require(halfLifeNs > 0, s"halfLifeNs must be positive, got $halfLifeNs")
    require(!df.columns.exists(c => c.toLowerCase.startsWith("__dc_")),
      "decayedCounts: input must not contain __dc_* columns")
    val base = df.select(keyCol.as("key"), tsCol.cast("long").as("__dc_t"))
    val withNow =
      if (now != null) base.withColumn("__dc_now", now.cast("long"))
      else base.crossJoin(
        broadcast(base.agg(max(col("__dc_t")).as("__dc_now"))))
    withNow
      .withColumn("__dc_age", greatest(col("__dc_now") - col("__dc_t"), lit(0L)))
      .withColumn("__dc_bk",
        least(expr(s"__dc_age div ${halfLifeNs}L"), lit(40L)).cast("int"))
      .withColumn("__dc_w", expr("shiftright(CAST(1000000 AS BIGINT), __dc_bk)"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"), sum(col("__dc_w")).as("decayed_e6"))
  }

  def retentionCohorts(df: DataFrame, keyCol: Column, tsCol: Column,
                       bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    // cohort = the first bucket's START TIME (long-exact; an index would
    // need a long division that detours through double), age in buckets
    val ev = df.select(keyCol.as("key"), tsCol.cast("long").as("__t"))
      .withColumn("__rb", col("__t") - pmod(col("__t"), lit(bucket)))
    val first = ev.groupBy(col("key")).agg(min(col("__rb")).as("cohort"))
    ev.join(first, "key")
      .withColumn("age", expr(s"(__rb - cohort) div ${bucket}L"))
      .select(col("key"), col("cohort"), col("age")).distinct()
      .groupBy(col("cohort"), col("age"))
      .agg(count(lit(1)).as("n_active"))
  }
}
