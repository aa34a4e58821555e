package graft

import graft.operators.{EventAnalytics, TemporalJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized differential tests for the behavioral-analytics family:
 * 300 seeded random events across a handful of keys, checked against
 * straightforward in-memory reference implementations. Small domains
 * force the edge cases (simultaneous events, empty windows, single-event
 * sessions) to occur constantly.
 */
class BehaviorPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(7)
  // (key, t, eid, value) — times in [0, 200) with heavy collisions
  private val events = (0 until 300).map { i =>
    (rnd.nextInt(5).toLong, rnd.nextInt(200).toLong, i.toLong, rnd.nextInt(50).toLong)
  }
  private def df = {
    import spark.implicits._
    events.toDF("k", "t", "eid", "v")
  }

  test("sessionize matches the per-key reference fold at several gaps") {
    for (gap <- Seq(1L, 5L, 20L)) {
      val got = TemporalJoin.sessionize(df, col("k"), col("t"), col("eid"), gap)
        .select(col("k"), col("eid"), col("session_seq"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = events.groupBy(_._1).flatMap { case (k, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        var seq = -1L; var prev = Long.MinValue
        sorted.map { e =>
          if (prev == Long.MinValue || e._2 - prev > gap) seq += 1
          prev = e._2
          (k, e._3) -> seq
        }
      }.toMap
      assert(got == want, s"gap=$gap")
    }
  }

  test("withTrailingStats matches the quadratic reference at several horizons") {
    for (h <- Seq(1L, 10L, 50L)) {
      val got = EventAnalytics.withTrailingStats(df, col("k"), col("t"), col("v"), h)
        .select(col("eid"), col("trail_cnt"), col("trail_sum_e6"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      events.foreach { case (k, t, eid, _) =>
        val win = events.filter(e => e._1 == k && e._2 >= t - h && e._2 <= t)
        assert(got(eid) == (win.size.toLong, win.map(_._4).sum), s"h=$h eid=$eid")
      }
    }
  }

  test("resampleLocf matches the per-key reference at several steps") {
    for (step <- Seq(7L, 25L)) {
      val got = TemporalJoin.resampleLocf(df, col("k"), col("t"), col("eid"),
          col("v"), step)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      val want = events.groupBy(_._1).flatMap { case (k, evs) =>
        val lo = evs.map(_._2).min; val hi = evs.map(_._2).max
        val sorted = evs.sortBy(e => (e._2, e._3)) // (t, eid) order; last wins
        ((lo - lo % step) to hi by step).map { g =>
          val at = sorted.filter(_._2 <= g)
          (k, g) -> at.lastOption.map(_._4)
        }
      }.toMap
      assert(got == want, s"step=$step")
    }
  }

  test("funnel matches the greedy reference on random stage streams") {
    import spark.implicits._
    val stages = Seq("A", "B", "C")
    val typed = (0 until 300).map { i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i.toLong,
        Seq("A", "B", "C", "X")(rnd.nextInt(4)))
    }
    val got = EventAnalytics.funnel(typed.toDF("k", "t", "eid", "typ"),
        col("k"), col("t"), col("eid"), col("typ"), stages)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2).toList)).toMap
    val want = typed.filter(e => stages.contains(e._4)).groupBy(_._1)
      .map { case (k, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        val times = scala.collection.mutable.ListBuffer[Long]()
        sorted.foreach { e =>
          if (times.size < stages.size && e._4 == stages(times.size)) times += e._2
        }
        k -> (times.size, times.toList)
      }
    assert(got == want)
  }

  test("retentionCohorts matches the reference matrix") {
    val bucket = 30L
    val got = EventAnalytics.retentionCohorts(df, col("k"), col("t"), bucket)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val first = events.groupBy(_._1).map { case (k, evs) =>
      k -> (evs.map(_._2).min / bucket * bucket) }
    val cells = events.map { case (k, t, _, _) =>
      (first(k), (t - t % bucket - first(k)) / bucket, k) }.distinct
    val want = cells.groupBy(c => (c._1, c._2)).map { case (cell, xs) =>
      cell -> xs.map(_._3).distinct.size.toLong }
    assert(got == want)
  }
}
