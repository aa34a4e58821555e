package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel and retention hand cases — greedy-order semantics, stage
  * skipping, tie determinism, cohort arithmetic. */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("funnel: greedy earliest in-order matching, skips, partial completion") {
    import spark.implicits._
    // u1 completes A@10 -> B@30 (ignoring B@5 BEFORE A) -> C@40
    // u2 reaches A@10, B@20, never C (C@15 is before B — out of order)
    // u3 only C events: reached 0 stages but present (has stage-type events)
    // u4 ties: A and B at the same t=10; event_id order lets B follow A
    val ev = Seq(
      (1L, 5L, 100L, "B"), (1L, 10L, 101L, "A"), (1L, 30L, 102L, "B"), (1L, 40L, 103L, "C"),
      (2L, 10L, 200L, "A"), (2L, 15L, 201L, "C"), (2L, 20L, 202L, "B"),
      (3L, 10L, 300L, "C"),
      (4L, 10L, 400L, "A"), (4L, 10L, 401L, "B"), (4L, 12L, 402L, "C"),
      (5L, 99L, 500L, "X") // non-stage type only: absent from output
    ).toDF("u", "t", "eid", "typ")
    val got = EventAnalytics.funnel(ev, col("u"), col("t"), col("eid"),
        col("typ"), Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2).toList)).toMap
    assert(got == Map(
      1L -> (3, List(10L, 30L, 40L)),
      2L -> (2, List(10L, 20L)),
      3L -> (0, Nil),
      4L -> (3, List(10L, 10L, 12L))))
  }

  test("trailing stats: closed range window, simultaneous events symmetric, spike rule") {
    import spark.implicits._
    // key 1, horizon 100: events at t=0(v=10), t=50(v=10), t=200(v=100),
    // t=200(v=2) — the two t=200 events see EACH OTHER (range frame);
    // v=100 at t=200: window = {100, 2} -> cnt 2, sum 102; spike: 100*2 > 2*102? no (200 < 204).
    val ev = Seq((1L, 0L, 10L, 1L), (1L, 50L, 10L, 2L),
      (1L, 200L, 100L, 3L), (1L, 200L, 2L, 4L)).toDF("k", "t", "v6", "eid")
    val got = EventAnalytics.withTrailingStats(ev, col("k"), col("t"), col("v6"),
        horizon = 100L)
      .select(col("eid"), col("trail_cnt"), col("trail_sum_e6"), col("spike"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got == Map(
      1L -> (1L, 10L, false),          // alone in window; 10 > 2*10 false
      2L -> (2L, 20L, false),          // {10,10}
      3L -> (2L, 102L, false),         // sees the simultaneous v=2
      4L -> (2L, 102L, false)))        // sees the simultaneous v=100
    // genuine spike: a value more than 2x the trailing mean
    val ev2 = Seq((1L, 0L, 10L, 1L), (1L, 10L, 10L, 2L), (1L, 20L, 100L, 3L))
      .toDF("k", "t", "v6", "eid")
    val sp = EventAnalytics.withTrailingStats(ev2, col("k"), col("t"), col("v6"),
        horizon = 100L)
      .filter(col("spike")).select(col("eid")).collect().map(_.getLong(0)).toSet
    assert(sp == Set(3L)) // 100*3 > 2*120
  }

  test("decayed counts: exact staircase halving, clamp at 40, future events full weight") {
    import graft.operators.EventAnalytics
    import org.apache.spark.sql.functions._
    val h = 100L // half-life in ts units
    // now = max(ts) = 1000; ages: 0, 99 (same bucket), 100, 250, 4100 (>40h), -50 (future clamp)
    val ev = spark.createDataFrame(Seq(
      ("a", 1000L), ("a", 901L), ("a", 900L), ("a", 750L),
      ("b", -3100L), ("b", 1050L)
    )).toDF("k", "ts")
    // "b"'s 1050 would make now=1050 if defaulted — pin now=1000 explicitly
    val got = EventAnalytics.decayedCounts(ev, col("k"), col("ts"), h, now = lit(1000L))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a: 1e6>>0 + 1e6>>0 + 1e6>>1 + 1e6>>2 = 1000000+1000000+500000+250000
    assert(got("a") == ((4L, 2750000L)))
    // b: age 4100 -> bucket 41 clamps to 40 -> 1e6>>40 = 0; future -> full
    assert(got("b") == ((2L, 1000000L)))
    // default now = in-plan max(ts) = 1050
    val def0 = EventAnalytics.decayedCounts(ev.filter(col("k") === "b"),
        col("k"), col("ts"), h)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(def0 == ((2L, 1000000L))) // 1050 age 0 full; -3100 clamped-out
    intercept[IllegalArgumentException] {
      EventAnalytics.decayedCounts(ev, col("k"), col("ts"), 0L)
    }
  }

  test("retention cohorts: first-bucket cohort, distinct actives per age") {
    import spark.implicits._
    // bucket 100: u1 first at 50 (cohort 0), active ages 0,1,3 (two events
    // in bucket 1 count once); u2 first at 120 (cohort 100), ages 0,1
    val ev = Seq((1L, 50L), (1L, 150L), (1L, 160L), (1L, 350L),
      (2L, 120L), (2L, 210L)).toDF("u", "t")
    val got = EventAnalytics.retentionCohorts(ev, col("u"), col("t"), bucket = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (100L, 0L) -> 1L, (100L, 1L) -> 1L))
  }
}
