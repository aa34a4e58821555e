package graft

import graft.functions.stf
import graft.operators.{JoinPredicate, SpatialJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized differential testing of the cell-replicate spatial join
 * against BroadcastNestedLoopJoin (the always-correct reference plan) —
 * reference test style #2 (SURVEY §5). Coordinates are generated as
 * multiples of half the cell size so geometries land EXACTLY on cell
 * boundaries, the classic failure mode of cell-join replication and
 * reference-point dedup.
 */
class DifferentialJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(7)

  private def mkData(n: Int, cellSize: Double) = {
    import spark.implicits._
    // points and boxes snapped to cellSize/2 — forces boundary collisions
    val snap = cellSize / 2
    val pts = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(20) * snap, rnd.nextInt(20) * snap)
    }.toDF("pid", "px", "py")
      .withColumn("pgeo", stf.st_point(col("px"), col("py")))
    val boxes = (0 until n / 2).map { i =>
      val x0 = rnd.nextInt(16) * snap; val y0 = rnd.nextInt(16) * snap
      (i.toLong, x0, y0, x0 + (rnd.nextInt(4) + 1) * snap, y0 + (rnd.nextInt(4) + 1) * snap)
    }.toDF("bid", "x0", "y0", "x1", "y1")
      .withColumn("bgeo", stf.st_box(col("x0"), col("y0"), col("x1"), col("y1")))
    (pts, boxes)
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("bid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cell join equals BNLJ for all five predicates at boundary-heavy data") {
    for (cellSize <- Seq(1.0, 3.0, 10.0); trial <- 1 to 2) {
      val (pts, boxes) = mkData(120, cellSize)
      for (pred <- Seq(JoinPredicate.Intersects, JoinPredicate.Contains,
                       JoinPredicate.Covers, JoinPredicate.CoveredBy,
                       JoinPredicate.ContainedBy)) {
        val cell = pairs(SpatialJoin.join(boxes, pts, col("bgeo"), col("pgeo"), pred, cellSize))
        val bnlj = pairs(SpatialJoin.broadcastJoin(boxes, pts, col("bgeo"), col("pgeo"), pred))
        assert(cell == bnlj,
          s"cellSize=$cellSize trial=$trial pred=$pred: " +
          s"missing=${(bnlj -- cell).take(5)} extra=${(cell -- bnlj).take(5)}")
      }
    }
  }

  test("STRtree-refined cell join and broadcast join equal the declarative plans") {
    for (cellSize <- Seq(1.0, 3.0, 10.0)) {
      val (pts, boxes) = mkData(120, cellSize)
      for (pred <- Seq(JoinPredicate.Intersects, JoinPredicate.Contains,
                       JoinPredicate.CoveredBy)) {
        val base = pairs(SpatialJoin.join(boxes, pts, col("bgeo"), col("pgeo"), pred, cellSize))
        val idx = pairs(SpatialJoin.joinIndexed(boxes, pts, "bgeo", "pgeo", pred, cellSize))
        assert(idx == base, s"joinIndexed cellSize=$cellSize pred=$pred: " +
          s"missing=${(base -- idx).take(5)} extra=${(idx -- base).take(5)}")
        val bidx = pairs(SpatialJoin.broadcastJoinIndexed(boxes, pts, "bgeo", "pgeo", pred))
        assert(bidx == base, s"broadcastJoinIndexed pred=$pred: " +
          s"missing=${(base -- bidx).take(5)} extra=${(bidx -- base).take(5)}")
      }
    }
  }

  test("quadtree-refined join equals the rtree and declarative plans") {
    val (pts, boxes) = mkData(120, 3.0)
    val base = pairs(SpatialJoin.join(boxes, pts, col("bgeo"), col("pgeo"),
      JoinPredicate.Intersects, 3.0))
    val quad = pairs(SpatialJoin.joinIndexed(boxes, pts, "bgeo", "pgeo",
      JoinPredicate.Intersects, 3.0, index = "quadtree"))
    assert(quad == base && base.nonEmpty)
    val bquad = pairs(SpatialJoin.broadcastJoinIndexed(boxes, pts, "bgeo", "pgeo",
      JoinPredicate.Intersects, index = "quadtree"))
    assert(bquad == base)
  }

  test("broadcastJoinIndexed fails loudly past the driver-collect bound") {
    val (pts, boxes) = mkData(50, 3.0)
    val e = intercept[IllegalArgumentException] {
      SpatialJoin.broadcastJoinIndexed(boxes, pts, "bgeo", "pgeo",
        JoinPredicate.Intersects, maxBroadcastRows = 10)
    }
    assert(e.getMessage.contains("joinIndexed"), e.getMessage)
    // at-the-bound still runs (the cap is inclusive)
    val ok = SpatialJoin.broadcastJoinIndexed(boxes, pts.limit(10), "bgeo", "pgeo",
      JoinPredicate.Intersects, maxBroadcastRows = 10)
    assert(ok.count() >= 0)
  }

  test("temporal interval-overlap join equals the cross-join filter, boundary-heavy") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    // intervals snapped to bucket/2 so starts/ends land exactly on bucket
    // boundaries — the dedup rule's failure mode
    val iv = (0 until 200).map { i =>
      val s = rnd.nextInt(40) * 50L
      (i.toLong, s, s + rnd.nextInt(6) * 50L)
    }.toDF("id", "s", "e")
    val a = iv.select(col("id").as("id_a"), col("s").as("sa"), col("e").as("ea"))
    val b = iv.select(col("id").as("id_b"), col("s").as("sb"), col("e").as("eb"))
    // bucket = -1 auto-sizes from the sampled median span — same rows as
    // every hand bucket (replication-only knob); degenerate input loud
    for (bucket <- Seq(50L, 100L, 300L, -1L)) {
      val got = TemporalJoin.overlaps(a, b, col("sa"), col("ea"), col("sb"), col("eb"), bucket)
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = a.crossJoin(b).filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp, s"bucket=$bucket missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
      val idx = TemporalJoin.overlapsIndexed(a, b, "sa", "ea", "sb", "eb", bucket)
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(idx == exp, s"interval-tree bucket=$bucket missing=${(exp -- idx).take(5)} extra=${(idx -- exp).take(5)}")
    }
    // auto cannot size from a side with no non-null bounds — loud, not silent
    val eNull = intercept[IllegalArgumentException] {
      TemporalJoin.overlaps(a,
        Seq((1L, Option.empty[Long], Option.empty[Long])).toDF("id_b", "sb", "eb"),
        col("sa"), col("ea"), col("sb"), col("eb"), -1L)
    }
    assert(eNull.getMessage.contains("auto"))
  }

  test("persisted interval store equals the live joins and the naive window filter") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    import graft.sources.IntervalStore
    val iv = (0 until 200).map { i =>
      val s = rnd.nextInt(40) * 50L
      (i.toLong, s, s + rnd.nextInt(6) * 50L)
    }.toDF("id", "s", "e")
    val a = iv.select(col("id").as("id_a"), col("s").as("sa"), col("e").as("ea"))
    val b = iv.select(col("id").as("id_b"), col("s").as("sb"), col("e").as("eb"))
    for (bucket <- Seq(50L, 300L)) {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_interval_store_spec_$bucket"
      IntervalStore.save(b, path, "sb", "eb", bucket)
      val live = TemporalJoin.overlaps(a, b, col("sa"), col("ea"), col("sb"), col("eb"), bucket)
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val stored = IntervalStore.overlapsJoin(a, path, "sa", "ea")
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stored == live && live.nonEmpty,
        s"bucket=$bucket missing=${(live -- stored).take(5)} extra=${(stored -- live).take(5)}")
      // window filter: boundary-inclusive on both edges (closed intervals)
      val (qs, qe) = (100L, 350L)
      val gotF = IntervalStore.filterOverlaps(spark, path, qs, qe)
        .select(col("id_b")).collect().map(_.getLong(0)).toSet
      val expF = iv.filter(col("s") <= qe && col("e") >= qs)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(gotF == expF, s"bucket=$bucket filter mismatch")
      // loadMeta round-trips
      val (bk, sc, ec, sch) = IntervalStore.loadMeta(spark, path)
      assert(bk == bucket && sc == "sb" && ec == "eb" && sch == b.schema)
    }
  }

  test("interval joins stay exact at nanosecond-scale epochs (past 2^53)") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    // epochs ~1.7e18: a double-division bucket id silently diverges from
    // floorDiv here; starts/ends snapped to bucket boundaries on purpose
    val base = 1700000000000000000L
    val bucket = 2500000000L
    val iv = (0 until 150).map { i =>
      val s = base + rnd.nextInt(40) * (bucket / 2)
      (i.toLong, s, s + rnd.nextInt(6) * (bucket / 2))
    }.toDF("id", "s", "e")
    val a = iv.select(col("id").as("id_a"), col("s").as("sa"), col("e").as("ea"))
    val b = iv.select(col("id").as("id_b"), col("s").as("sb"), col("e").as("eb"))
    val exp = a.crossJoin(b).filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = TemporalJoin.overlaps(a, b, col("sa"), col("ea"), col("sb"), col("eb"), bucket)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp, s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    val idx = TemporalJoin.overlapsIndexed(a, b, "sa", "ea", "sb", "eb", bucket)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idx == exp, s"tree missing=${(exp -- idx).take(5)} extra=${(idx -- exp).take(5)}")
    // the persisted path shares bucketOf and the outward-ulp tree rounding —
    // pin it at the same magnitude (save-side explode + read-side refine)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_interval_store_nano"
    graft.sources.IntervalStore.save(b, path, "sb", "eb", bucket)
    val stored = graft.sources.IntervalStore.overlapsJoin(a, path, "sa", "ea")
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == exp,
      s"store missing=${(exp -- stored).take(5)} extra=${(stored -- exp).take(5)}")
  }

  test("as-of join equals the window-ranked cross join, boundary-heavy") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    import org.apache.spark.sql.expressions.Window
    // times snapped to bucket multiples so at-or-before ties and window
    // edges land exactly on bucket boundaries
    val l = (0 until 150).map(i => (i.toLong, rnd.nextInt(30) * 100L)).toDF("id_a", "ta")
    val r = (0 until 150).map(i => (i.toLong, rnd.nextInt(30) * 100L)).toDF("id_b", "tb")
    for (lookback <- Seq(100L, 300L, 1000L)) {
      val got = TemporalJoin.asOf(l, r, "id_a", col("ta"), col("tb"), lookback, col("id_b"))
        .select(col("id_a"), col("id_b")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val exp = l.crossJoin(r)
        .filter(col("tb") <= col("ta") && col("tb") > col("ta") - lookback)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("id_a")).orderBy(col("tb").desc, col("id_b").desc)))
        .filter(col("__rn") === 1)
        .select(col("id_a"), col("id_b")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == exp, s"lookback=$lookback " +
        s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("as-of join carries non-orderable right payloads (MapType)") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    // the carry-in aggregate orders by (t, tieBreak) only, so a MapType
    // right column (unorderable — max(struct(...)) over it fails
    // analysis) must ride through untouched
    val l = Seq((1L, 100L)).toDF("id_a", "ta")
    val r = Seq((10L, 50L), (11L, 90L)).toDF("id_b", "tb")
      .withColumn("props", map(lit("k"), col("id_b")))
    val got = TemporalJoin.asOf(l, r, "id_a", col("ta"), col("tb"),
        1000L, col("id_b"))
      .select(col("id_b"), col("props")(lit("k")).as("pv")).collect()
    assert(got.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((11L, 11L)))
  }

  test("keyed as-of join equals the keyed window-ranked cross join, hot key + nulls") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    import org.apache.spark.sql.expressions.Window
    // ~2/3 of rows on key 0 — one hot entity whose timeline spans many
    // range partitions (the case the per-(pid, key) carry + boundary
    // heal exists for); times snapped so at-or-before ties are common;
    // a few NULL keys on each side must match nothing
    def key(i: Int): java.lang.Long =
      if (i % 17 == 0) null else if (i % 3 == 0) rnd.nextInt(4).toLong else 0L
    val l = (0 until 200).map(i => (i.toLong, key(i), rnd.nextInt(30) * 100L))
      .toDF("id_a", "ka", "ta")
    val r = (0 until 200).map(i => (i.toLong, key(i + 1), rnd.nextInt(30) * 100L))
      .toDF("id_b", "kb", "tb")
    for (lookback <- Seq(100L, 300L, 1000L)) {
      val got = TemporalJoin.asOfKeyed(l, r, "id_a", col("ka"), col("kb"),
          col("ta"), col("tb"), lookback, col("id_b"))
        .select(col("id_a"), col("id_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val exp = l.crossJoin(r)
        .filter(col("kb") === col("ka") &&
          col("tb") <= col("ta") && col("tb") > col("ta") - lookback)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("id_a")).orderBy(col("tb").desc, col("id_b").desc)))
        .filter(col("__rn") === 1)
        .select(col("id_a"), col("id_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == exp, s"lookback=$lookback " +
        s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
    // constant-key degenerate == the unkeyed kernel (they share asOfImpl,
    // but pin the public contract, not the implementation accident)
    val lc = l.filter(col("ka").isNotNull); val rc = r.filter(col("kb").isNotNull)
    val keyedConst = TemporalJoin.asOfKeyed(lc, rc, "id_a", lit(1), lit(1),
        col("ta"), col("tb"), 300L, col("id_b"))
      .select(col("id_a"), col("id_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val unkeyed = TemporalJoin.asOf(lc, rc, "id_a", col("ta"), col("tb"),
        300L, col("id_b"))
      .select(col("id_a"), col("id_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(keyedConst == unkeyed)
  }

  test("LEFT OUTER as-of: every left row exactly once, matches equal inner, null keys unmatched") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    def key(i: Int): java.lang.Long =
      if (i % 17 == 0) null else if (i % 3 == 0) rnd.nextInt(4).toLong else 0L
    val l = (0 until 200).map(i => (i.toLong, key(i), rnd.nextInt(30) * 100L))
      .toDF("id_a", "ka", "ta")
    val r = (0 until 200).map(i => (i.toLong, key(i + 1), rnd.nextInt(30) * 100L))
      .toDF("id_b", "kb", "tb")
    for (lookback <- Seq(100L, 1000L)) {
      val outer = TemporalJoin.asOfKeyed(l, r, "id_a", col("ka"), col("kb"),
          col("ta"), col("tb"), lookback, col("id_b"), outer = true)
        .select(col("id_a"), col("id_b")).collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1))))
      // totality + uniqueness: one row per left row, no drops, no dups
      assert(outer.length == 200, s"outer must keep every left row: ${outer.length}")
      assert(outer.map(_._1).distinct.length == 200)
      // the matched subset IS the inner join
      val inner = TemporalJoin.asOfKeyed(l, r, "id_a", col("ka"), col("kb"),
          col("ta"), col("tb"), lookback, col("id_b"))
        .select(col("id_a"), col("id_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(outer.collect { case (a, Some(b)) => (a, b) }.toSet == inner,
        s"lookback=$lookback")
      // null-keyed left rows are present and unmatched
      val nullKey = (0 until 200).filter(_ % 17 == 0).map(_.toLong).toSet
      assert(outer.filter(x => nullKey(x._1)).forall(_._2.isEmpty))
    }
    // the unkeyed outer keeps pre-window lefts unmatched too
    val lo = Seq((1L, 5L), (2L, 500L)).toDF("id_a", "ta")
    val ro = Seq((10L, 100L)).toDF("id_b", "tb")
    val got = TemporalJoin.asOf(lo, ro, "id_a", col("ta"), col("tb"),
        1000L, col("id_b"), outer = true)
      .select(col("id_a"), col("id_b")).collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(got == Set((1L, None), (2L, Some(10L))))
    // outer mode rejects SHARED column names at the API boundary (the
    // unionByName of the null-extended lefts would otherwise fail deep in
    // the analyzer); inner mode still tolerates them (select-only output)
    val lShared = Seq((1L, 5L, "x")).toDF("id_a", "ta", "tag")
    val rShared = Seq((10L, 1L, "y")).toDF("id_b", "tb", "TAG")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asOf(lShared, rShared, "id_a", col("ta"), col("tb"),
        1000L, col("id_b"), outer = true)
    }
    assert(e.getMessage.contains("share column name"))
    assert(TemporalJoin.asOf(lShared, rShared, "id_a", col("ta"), col("tb"),
      1000L, col("id_b")).count() == 1L)
  }

  test("sessionize: gap-break hand case, tie safety, key isolation, stats rollup") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    // user 1: events at 0, 50, 500 (gap 100 ⇒ sessions 0,0,1); user 2:
    // simultaneous pair at t=1000 far from everything (one session); the
    // shared timeline never leaks across keys
    val ev = Seq((1L, 0L, 10L), (1L, 50L, 11L), (1L, 500L, 12L),
      (2L, 1000L, 20L), (2L, 1000L, 21L), (2L, 0L, 22L)).toDF("user", "t", "eid")
    val got = TemporalJoin.sessionize(ev, col("user"), col("t"), col("eid"), gap = 100L)
      .select(col("user"), col("eid"), col("session_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 10L) -> 0L, (1L, 11L) -> 0L, (1L, 12L) -> 1L,
      (2L, 22L) -> 0L, (2L, 20L) -> 1L, (2L, 21L) -> 1L))
    val stats = TemporalJoin.sessionStats(
        TemporalJoin.sessionize(ev, col("user"), col("t"), col("eid"), gap = 100L),
        col("user"), col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(stats((1L, 0L)) == (2L, 0L, 50L, 50L))
    assert(stats((1L, 1L)) == (1L, 500L, 500L, 0L))
    assert(stats((2L, 1L)) == (2L, 1000L, 1000L, 0L))
  }

  test("resampleLocf: grid alignment, carry-forward, pre-observation NULL, same-instant carry") {
    import spark.implicits._
    import graft.operators.TemporalJoin
    // key 1: obs at t=95 (v=7), t=210 (v=9); step 100 ⇒ grid 0,100,200:
    // 0 → NULL (before first obs), 100 → 7, 200 → 7 (carry across the gap)
    // key 2: single obs exactly ON a grid point (t=100, v=5) ⇒ grid 100 → 5
    // key 3: SIMULTANEOUS obs at t=50 (eid 1 → v=8, eid 2 → v=6): the
    // larger tie-break wins deterministically ⇒ grid 100 → 6 (a later
    // obs at t=150 extends the grid past the tie)
    val ev = Seq((1L, 95L, 10L, 7L), (1L, 210L, 11L, 9L), (2L, 100L, 20L, 5L),
      (3L, 50L, 1L, 8L), (3L, 50L, 2L, 6L), (3L, 150L, 3L, 1L))
      .toDF("k", "t", "eid", "v")
    val got = TemporalJoin.resampleLocf(ev, col("k"), col("t"), col("eid"),
        col("v"), step = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == Map((1L, 0L) -> None, (1L, 100L) -> Some(7L), (1L, 200L) -> Some(7L),
      (2L, 100L) -> Some(5L), (3L, 0L) -> None, (3L, 100L) -> Some(6L)))
  }

  test("hot cell: indexed join stays correct when everything lands in one cell") {
    import spark.implicits._
    // 600 points + 300 boxes inside one 1000-unit cell: the declarative join
    // would refine 180k pairs with JTS; the tree probe visits only envelope
    // hits. Assert exact equality of outputs.
    val pts = (0 until 600).map { i =>
      (i.toLong, (i * 37 % 500).toDouble, (i * 61 % 500).toDouble)
    }.toDF("pid", "px", "py").withColumn("pgeo", stf.st_point(col("px"), col("py")))
    val boxes = (0 until 300).map { i =>
      val x0 = (i * 53 % 480).toDouble; val y0 = (i * 29 % 480).toDouble
      (i.toLong, x0, y0, x0 + 20, y0 + 20)
    }.toDF("bid", "x0", "y0", "x1", "y1")
      .withColumn("bgeo", stf.st_box(col("x0"), col("y0"), col("x1"), col("y1")))
    val base = pairs(SpatialJoin.broadcastJoin(boxes, pts, col("bgeo"), col("pgeo"),
      JoinPredicate.Contains))
    val idx = pairs(SpatialJoin.joinIndexed(boxes, pts, "bgeo", "pgeo",
      JoinPredicate.Contains, cellSize = 1000.0))
    assert(idx == base && base.nonEmpty)
  }

  test("distance join equals BNLJ within-distance for boundary-heavy data") {
    for (cellSize <- Seq(2.0, 5.0)) {
      val (pts, boxes) = mkData(100, cellSize)
      // 100x: radius >> cellSize exercises the cell-size floor — without it
      // every row replicates onto ~(2·radius/cellSize)² cells
      for (radius <- Seq(cellSize / 2, cellSize, 2.5 * cellSize, 100 * cellSize)) {
        val cell = pairs(SpatialJoin.distanceJoin(boxes, pts, col("bgeo"), col("pgeo"),
          radius, cellSize))
        val bnlj = pairs(boxes.crossJoin(pts)
          .filter(stf.st_within_distance(col("bgeo"), col("pgeo"), lit(radius))))
        assert(cell == bnlj,
          s"cellSize=$cellSize radius=$radius: " +
          s"missing=${(bnlj -- cell).take(5)} extra=${(cell -- bnlj).take(5)}")
      }
    }
  }
}
