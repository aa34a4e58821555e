package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL as-of rewrite (plans/AsOfJoinRule): the rank-and-keep-one
  * shape (row_number() = 1 over a keyed time-bounded join) replans onto
  * the carry-forward union timeline — no join in the physical plan —
  * with results identical to Spark's own join+window plan, and declines
  * every shape whose semantics it cannot preserve. */
class AsOfJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withAsOf[T](f: => T): T = {
    val key = "spark.graft.join.asof"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Dense keyed fixture: ~8 users, time collisions on BOTH sides,
    * (key, t, tb) unique among rights (the rank contract), NULL keys
    * and NULL times planted on both sides. */
  private def mkViews(): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val clicks = (0 until 160).map { i =>
      val u: java.lang.Long = if (i % 23 == 0) null else (rnd.nextInt(8)).toLong
      val t: java.lang.Long = if (i % 31 == 0) null else rnd.nextInt(50) * 10L
      (i.toLong, u, t)
    }
    val views = (0 until 240).map { i =>
      val u: java.lang.Long = if (i % 19 == 0) null else (rnd.nextInt(8)).toLong
      val t: java.lang.Long = if (i % 29 == 0) null else rnd.nextInt(50) * 10L
      (i.toLong + 10000L, u, t, s"p$i")
    }
    clicks.toDF("id_a", "ua", "ta").createOrReplaceTempView("aoc")
    views.toDF("id_b", "ub", "tb", "payload").createOrReplaceTempView("aov")
  }

  /** The same SQL with the rule disabled — Spark's own join + window
    * rank plan (InferWindowGroupLimit and all). */
  private def brute(sql: String): Seq[Seq[Any]] =
    norm(spark.sql(sql))

  private def norm(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)
      .sortBy(_.mkString("|"))

  private def assertRewritten(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"as-of rewrite must eliminate the join entirely:\n${plan.take(1200)}")
    assert(plan.contains("Window"), plan.take(400))
  }

  private def assertDeclined(df: DataFrame): Unit = {
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join") && plan.contains("row_number"),
      s"shape must be left to Spark's own plan:\n${plan.take(1200)}")
  }

  // the canonical keyed as-of with a lookback and a deterministic tie key
  private val canonical =
    "SELECT id_a, id_b, payload FROM (" +
    "SELECT c.id_a, v.id_b, v.payload, row_number() OVER " +
    "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
    "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta AND v.tb > c.ta - 120" +
    ") WHERE rn = 1"

  test("keyed as-of rewrites to the carry-forward timeline; result equals Spark's join+window plan") {
    mkViews()
    val want = brute(canonical)
    assert(want.nonEmpty, "fixture must produce matches")
    withAsOf {
      val df = spark.sql(canonical)
      assertRewritten(df)
      assert(norm(df) == want)
    }
  }

  test("strict bound excludes the equal instant; non-strict includes it (both rewritten)") {
    mkViews()
    for (op <- Seq("<", "<=")) {
      val sql =
        "SELECT id_a, id_b FROM (" +
        "SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        s"FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb $op c.ta" +
        ") WHERE rn = 1"
      val want = brute(sql)
      withAsOf {
        val df = spark.sql(sql)
        assertRewritten(df)
        assert(norm(df) == want, s"op=$op")
      }
    }
    // and the two differ on this fixture (equal instants exist)
    withAsOf {
      val strict = norm(spark.sql(canonical.replace("v.tb <= c.ta AND", "v.tb < c.ta AND")))
      val loose = norm(spark.sql(canonical))
      assert(strict != loose, "fixture must exercise the equal-instant edge")
    }
  }

  test("ascending tie keys, >= lower bounds, composite keys, residual filters all preserve semantics") {
    mkViews()
    for (sql <- Seq(
      // ASC tie key (reversed to DESC in the timeline order)
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b ASC) AS rn " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 1",
      // non-strict lower bound, reversed orientations
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c JOIN aov v ON c.ua = v.ub AND c.ta >= v.tb AND v.tb >= c.ta - 120) WHERE rn = 1",
      // composite key (ua, ua % 2) — two equality conjuncts
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.id_b % 2 = c.id_a % 2 " +
        "AND v.tb <= c.ta) WHERE rn = 1",
      // residual conjunct beside rn = 1 stays above the rewrite
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) " +
        "WHERE rn = 1 AND id_a % 3 = 0",
      // rn <= 1 spelling
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn <= 1")) {
      val want = brute(sql)
      withAsOf {
        val df = spark.sql(sql)
        assertRewritten(df)
        assert(norm(df) == want, sql)
      }
    }
  }

  test("agrees with the typed operator kernel on tie-free data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // unique (key, t) on the right: the operator's tieBreak and the SQL
    // tie key then pick identically
    val clicks = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(300) * 10L))
    val views = (0 until 300).map(i =>
      (i.toLong + 5000L, i % 6L, (i / 6) * 37L)) // unique (key, t)
    val cdf = clicks.toDF("id_a", "ua", "ta")
    val vdf = views.toDF("id_b", "ub", "tb")
    cdf.createOrReplaceTempView("aoc2"); vdf.createOrReplaceTempView("aov2")
    val typed = operators.TemporalJoin.asOfKeyed(cdf, vdf, leftId = "id_a",
        col("ua"), col("ub"), col("ta"), col("tb"),
        maxLookback = 500L, tieBreak = col("id_b"))
      .select(col("id_a"), col("id_b"))
    val sql =
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
      "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
      "FROM aoc2 c JOIN aov2 v ON v.ub = c.ua AND v.tb <= c.ta " +
      "AND v.tb > c.ta - 500) WHERE rn = 1"
    withAsOf {
      val df = spark.sql(sql)
      assertRewritten(df)
      assert(norm(df) == norm(typed))
    }
  }

  test("TIMESTAMP time columns rewrite too (any orderable type; no bucket arithmetic to restrict)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val cdf = (0 until 80).map(i => (i.toLong, rnd.nextInt(5).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(500) * 1000L)))
      .toDF("id_a", "ua", "ta")
    val vdf = (0 until 120).map(i => (i.toLong + 9000L, i % 5L,
        new java.sql.Timestamp(1700000000000L + (i / 5) * 2100L)))
      .toDF("id_b", "ub", "tb")
    cdf.createOrReplaceTempView("aoc5"); vdf.createOrReplaceTempView("aov5")
    // lookback via INTERVAL arithmetic on the left side — still a lower
    // bound on the same right expression, still a monotone post-filter
    val sql = "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
      "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
      "FROM aoc5 c JOIN aov5 v ON v.ub = c.ua AND v.tb <= c.ta " +
      "AND v.tb > c.ta - INTERVAL 3 MINUTE) WHERE rn = 1"
    val want = brute(sql)
    assert(want.nonEmpty)
    withAsOf {
      val df = spark.sql(sql)
      assertRewritten(df)
      assert(norm(df) == want)
    }
  }

  test("declines: conf off, unkeyed, right-side partition, rn = 2, foreign conjuncts, custom null order") {
    mkViews()
    // conf off: the rule must not exist in the plan
    val off = spark.sql(canonical)
    assert(off.queryExecution.optimizedPlan.toString.contains("Join"))
    withAsOf {
      for (sql <- Seq(
        // no key equality: the typed asOf is the unkeyed scale path
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY c.id_a ORDER BY v.tb DESC) AS rn " +
          "FROM aoc c JOIN aov v ON v.tb <= c.ta) WHERE rn = 1",
        // partition by a right column: not per-left-row semantics
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY v.id_b ORDER BY v.tb DESC) AS rn " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 1",
        // rank 2 is not an as-of
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY c.id_a ORDER BY v.tb DESC) AS rn " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 2",
        // a two-sided non-equality conjunct is not the as-of shape
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY c.id_a ORDER BY v.tb DESC) AS rn " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta " +
          "AND v.tb + c.ta < 400) WHERE rn = 1",
        // an upper bound on a SECOND right expression (two uppers)
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY c.id_a ORDER BY v.tb DESC) AS rn " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta " +
          "AND v.id_b <= c.ta) WHERE rn = 1",
        // NULLS FIRST on a DESC key is not the default rank order
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY c.id_a ORDER BY v.tb DESC NULLS FIRST) AS rn " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 1")) {
        assertDeclined(spark.sql(sql))
      }
    }
  }

  test("LEFT OUTER as-of rewrites too: unmatched lefts survive null-extended, equal to Spark's plan") {
    mkViews()
    for (sql <- Seq(
      // plain outer, with a tie key
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c LEFT JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 1",
      // outer + lookback: an out-of-window best must read as NO match
      // (null-extended), not a drop — the combination the inner filter
      // can't express
      "SELECT id_a, id_b, payload FROM (SELECT c.id_a, v.id_b, v.payload, " +
        "row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c LEFT JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta " +
        "AND v.tb > c.ta - 120) WHERE rn = 1",
      // outer + strict bound
      "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c LEFT JOIN aov v ON v.ub = c.ua AND v.tb < c.ta) WHERE rn = 1")) {
      val want = brute(sql)
      assert(want.exists(_(1) == null), "fixture must produce unmatched lefts")
      withAsOf {
        val df = spark.sql(sql)
        assertRewritten(df)
        assert(norm(df) == want, sql)
      }
    }
    // every left row (160) appears exactly once, null keys/times included
    withAsOf {
      val df = spark.sql(
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c LEFT JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 1")
      val ids = df.collect().map(_.getLong(0))
      assert(ids.length == 160 && ids.distinct.length == 160)
    }
  }

  test("typed outer kernel agrees with the rewritten outer SQL on tie-free data") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val clicks = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(300) * 10L))
    val views = (0 until 90).map(i =>
      (i.toLong + 5000L, i % 6L, (i / 6) * 37L))
    val cdf = clicks.toDF("id_a", "ua", "ta")
    val vdf = views.toDF("id_b", "ub", "tb")
    cdf.createOrReplaceTempView("aoc4"); vdf.createOrReplaceTempView("aov4")
    val typed = operators.TemporalJoin.asOfKeyed(cdf, vdf, leftId = "id_a",
        col("ua"), col("ub"), col("ta"), col("tb"),
        maxLookback = 500L, tieBreak = col("id_b"), outer = true)
      .select(col("id_a"), col("id_b"))
    withAsOf {
      val df = spark.sql(
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc4 c LEFT JOIN aov4 v ON v.ub = c.ua AND v.tb <= c.ta " +
        "AND v.tb > c.ta - 500) WHERE rn = 1")
      assertRewritten(df)
      assert(norm(df) == norm(typed))
    }
  }

  test("max_by aggregation form rewrites to the same timeline (inner, outer, lookback, bare ordering)") {
    mkViews()
    for (sql <- Seq(
      // canonical: struct ordering (t, tie), lookback
      "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS id_b " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta " +
        "AND v.tb > c.ta - 120 GROUP BY c.id_a",
      // LEFT OUTER: every left row's group exists; unmatched -> NULL
      "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS id_b " +
        "FROM aoc c LEFT JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta " +
        "GROUP BY c.id_a",
      // bare r.t ordering (tie-free pick is arbitrary for the user too,
      // but max_by(value = the tie column itself) is deterministic)
      "SELECT c.id_a, max_by(v.id_b, v.tb + 0) AS id_b " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta GROUP BY c.id_a",
      // two max_by's sharing the ordering + a value expression mixing sides
      "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS id_b, " +
        "max_by(v.tb - c.ta, struct(v.tb, v.id_b)) AS lag " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta GROUP BY c.id_a",
      // strict bound
      "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS id_b " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb < c.ta GROUP BY c.id_a")) {
      val want = brute(sql)
      assert(want.nonEmpty, sql)
      withAsOf {
        val df = spark.sql(sql)
        assertRewritten(df)
        assert(norm(df) == want, sql)
      }
    }
    // the bare-t pick with a NON-tie value would be ambiguous — but the
    // last test above is deterministic because (ua, tb) is unique after
    // none... (the aov fixture has duplicate (ub, tb)); pin instead that
    // max_by == the rank form on the same ordering
    withAsOf {
      val viaAgg = norm(spark.sql(
        "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS id_b " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta GROUP BY c.id_a"))
      val viaRank = norm(spark.sql(
        "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
        "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
        "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 1"))
      assert(viaAgg == viaRank, "the two declarative spellings must agree")
    }
  }

  test("max_by declines: mixed aggregates, differing orderings, ordering not the bounded time") {
    mkViews()
    withAsOf {
      for (sql <- Seq(
        // a second, non-max_by aggregate cannot ride the single carry
        "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS id_b, count(*) AS n " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta GROUP BY c.id_a",
        // two max_by's with DIFFERENT orderings
        "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS x, " +
          "max_by(v.id_b, v.id_b + 0) AS y " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta GROUP BY c.id_a",
        // ordering is not the time the join bounds
        "SELECT c.id_a, max_by(v.id_b, v.id_b + 0) AS id_b " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta GROUP BY c.id_a",
        // group key from the right side
        "SELECT v.id_b, max_by(v.id_b, struct(v.tb, v.id_b)) AS x " +
          "FROM aoc c JOIN aov v ON v.ub = c.ua AND v.tb <= c.ta GROUP BY v.id_b")) {
        val plan = spark.sql(sql).queryExecution.optimizedPlan.toString
        assert(plan.contains("Join"), s"must decline:\n$sql\n${plan.take(600)}")
      }
    }
  }

  test("left rows with no in-window right are dropped (inner semantics); null keys and times match nothing") {
    import spark.implicits._
    val cdf = Seq(
      (1L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(100L)), // has a match
      (2L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L)),   // before every view
      (3L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(100L)), // null key
      (4L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]))   // null time
      .toDF("id_a", "ua", "ta")
    val vdf = Seq(
      (10L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(50L)),
      (11L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(60L)),
      (12L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]))
      .toDF("id_b", "ub", "tb")
    cdf.createOrReplaceTempView("aoc3"); vdf.createOrReplaceTempView("aov3")
    val sql = "SELECT id_a, id_b FROM (SELECT c.id_a, v.id_b, row_number() OVER " +
      "(PARTITION BY c.id_a ORDER BY v.tb DESC) AS rn " +
      "FROM aoc3 c JOIN aov3 v ON v.ub = c.ua AND v.tb <= c.ta) WHERE rn = 1"
    withAsOf {
      val df = spark.sql(sql)
      assertRewritten(df)
      assert(norm(df) == Seq(Seq(1L, 10L)))
    }
  }

  test("hot-key gate: a 95%-one-key input declines the rewrite; threshold >= 1 disables the gate") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // 95% of both sides on key 7 — the rewritten window would funnel it
    // into one task; the sampled-share probe must decline instead
    def side(idBase: Long) = (0 until 900).map { i =>
      val u = if (i % 20 == 0) rnd.nextInt(50).toLong + 100L else 7L
      (idBase + i, u, rnd.nextInt(500) * 10L)
    }
    side(0L).toDF("id_a", "ua", "ta").createOrReplaceTempView("hot_c")
    side(10000L).toDF("id_b", "ub", "tb").createOrReplaceTempView("hot_v")
    val sql =
      "SELECT id_a, id_b FROM (" +
      "SELECT c.id_a, v.id_b, row_number() OVER " +
      "(PARTITION BY c.id_a ORDER BY v.tb DESC, v.id_b DESC) AS rn " +
      "FROM hot_c c JOIN hot_v v ON v.ub = c.ua AND v.tb <= c.ta" +
      ") WHERE rn = 1"
    val want = brute(sql)
    withAsOf {
      // declined, and the unrewritten plan still answers identically
      val df = spark.sql(sql)
      assertDeclined(df)
      assert(norm(df) == want)
      // >= 1 disables the gate: same data rewrites, same rows
      val key = "spark.graft.join.asofMaxKeyShare"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "1.0")
      try {
        val forced = spark.sql(sql)
        assertRewritten(forced)
        assert(norm(forced) == want)
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
