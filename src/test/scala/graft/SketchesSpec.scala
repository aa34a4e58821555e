package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Mergeable sketches: exact local replay of the md5-derived register /
 * counter arithmetic, the merge-transparency laws that make the sketches
 * safe for incremental stores, and the estimator guarantees (HLL accuracy
 * band, CMS overcount-only).
 */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference HLL (bucket, rho) for one value — the documented formula. */
  private def hllRef(value: String, salt: String, pBits: Int): (Long, Int) = {
    val h = md5hex(value + ":" + salt)
    val bucket = java.lang.Long.parseLong(h.substring(0, 4), 16) % (1L << pBits)
    val w = java.lang.Long.parseLong(h.substring(4, 16), 16)
    val rho = if (w == 0L) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (bucket, rho)
  }

  private def regSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Int)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  test("HLL registers equal the local md5 replay exactly") {
    import spark.implicits._
    val values = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val df = values.toDF("v").withColumn("g", lit("g1"))
    val got = regSet(Sketches.hllRegisters(df, col("g"), col("v"), pBits = 10))
    val want = values.map(v => hllRef(v, "hll", 10))
      .groupBy(_._1).map { case (b, rs) => ("g1", b, rs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("HLL merge transparency: merge(regs(A), regs(B)) == regs(A ∪ B); duplicates free") {
    import spark.implicits._
    val a = (0 until 300).map(i => s"doc $i").toDF("v").withColumn("g", lit("g"))
    val b = (200 until 500).map(i => s"doc $i").toDF("v").withColumn("g", lit("g"))
    val merged = regSet(Sketches.hllMerge(
      Sketches.hllRegisters(a, col("g"), col("v")),
      Sketches.hllRegisters(b, col("g"), col("v"))))
    val direct = regSet(Sketches.hllRegisters(
      a.unionByName(b), col("g"), col("v")))
    assert(merged == direct) // overlap 200..299 changes nothing: max is idempotent
  }

  test("HLL estimate: exact integer formula replays locally; corrected est within 10% at n=5000") {
    import spark.implicits._
    val df = (0 until 5000).map(i => s"unique value $i").toDF("v")
      .withColumn("g", lit("g"))
    val regs = Sketches.hllRegisters(df, col("g"), col("v"), pBits = 10)
    val est = Sketches.hllEstimate(regs, pBits = 10).collect().head
    // integer estimator replay from the register rows
    val rows = regs.collect().map(r => (r.getLong(1), r.getInt(2)))
    val m = 1024L
    val n = rows.map { case (_, rho) => BigInt(1) << (49 - rho) }.sum +
      BigInt(m - rows.length) * (BigInt(1) << 49)
    val num = BigInt(1000000) * 7213000 * BigInt(m).pow(3) * (BigInt(1) << 49)
    val d1 = BigInt(10000) * (1000 * m + 1079)
    assert(BigInt(est.getAs[Long]("est_raw_e6")) == num / (d1 * n))
    // 1.04/sqrt(1024) = 3.25% std error; 10% is ~3 sigma
    assert(math.abs(est.getAs[Double]("est") / 5000.0 - 1.0) < 0.10)
  }

  test("CMS: estimates never undercount, and equal exact counts when collision-free") {
    import spark.implicits._
    val occurrences = (0 until 9).flatMap(k => Seq.fill(k + 1)(s"key$k"))
    val df = occurrences.toDF("k")
    val exact = occurrences.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    // precondition: this fixture's 10 keys × 4 rows land in distinct cells
    val cells = (0 until 4).flatMap(i => exact.keys.map(k =>
      (i, java.lang.Long.parseLong(md5hex(s"$i:cms:$k").substring(0, 12), 16) % 4096)))
    assert(cells.distinct.size == cells.size, "fixture must be collision-free")
    val counters = Sketches.cmsCounters(df, col("k"), lit(1L), width = 4096)
    val est = Sketches.cmsEstimate(counters, df, col("k"), width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact) // collision-free ⇒ min over rows is the true count
    // overcount-only holds even under forced collisions (width 2)
    val tight = Sketches.cmsCounters(df, col("k"), lit(1L), width = 2)
    val est2 = Sketches.cmsEstimate(tight, df, col("k"), width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(est2(k) >= c) }
    // a key the sketch never saw: empty cells count 0, so a collision-free
    // unseen key estimates EXACTLY 0 (it must neither vanish from the
    // output nor inherit the min of only its colliding cells)
    val unseen = Seq("neverKey").toDF("k")
    val cellsU = (0 until 4).map(i =>
      (i, java.lang.Long.parseLong(md5hex(s"$i:cms:neverKey").substring(0, 12), 16) % 4096))
    assert(cellsU.forall(c => !cells.contains(c)), "fixture: unseen key must miss all cells")
    val estU = Sketches.cmsEstimate(counters, unseen, col("k"), width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estU == Map("neverKey" -> 0L))
  }

  test("CMS merge transparency: merge(cms(A), cms(B)) == cms(A ∪ B)") {
    import spark.implicits._
    val a = Seq("x", "y", "x", "z").toDF("k")
    val b = Seq("y", "y", "w").toDF("k")
    def cset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val merged = cset(Sketches.cmsMerge(
      Sketches.cmsCounters(a, col("k"), lit(1L)),
      Sketches.cmsCounters(b, col("k"), lit(1L))))
    val direct = cset(Sketches.cmsCounters(a.unionByName(b), col("k"), lit(1L)))
    assert(merged == direct)
  }

  test("HLL union pairs: inclusion-exclusion overlap lands near truth on overlapping sets") {
    import spark.implicits._
    // A = 0..1199, B = 800..1999, C disjoint: true overlaps AB=400, AC=0,
    // BC=0. Unions (2000, 2200, 2200) stay under 2.5m=2560 — the linear-
    // counting regime, clear of the raw estimator's documented 2.5m..5m
    // bias band.
    val df = ((0 until 1200).map(i => ("A", s"val $i")) ++
      (800 until 2000).map(i => ("B", s"val $i")) ++
      (0 until 1000).map(i => ("C", s"other $i"))).toDF("g", "v")
    val regs = Sketches.hllRegisters(df, col("g"), col("v"), pBits = 10)
    val rows = Sketches.hllUnionPairs(regs, pBits = 10)
      .select(col("source_a"), col("source_b"), col("est_overlap"), col("est_union"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    // union estimates within 10% (>3 sigma of linear counting here)
    assert(math.abs(rows(("A", "B"))._2 / 2000.0 - 1.0) < 0.10)
    assert(math.abs(rows(("A", "C"))._2 / 2200.0 - 1.0) < 0.10)
    // overlap = a difference of estimates; ±250 is ~3 sigma for these sizes
    assert(math.abs(rows(("A", "B"))._1 - 400.0) < 250.0)
    assert(rows(("A", "C"))._1 < 250.0 && rows(("B", "C"))._1 < 250.0)
    // the union registers themselves are exact: A∪B registers == registers of the concatenated set
    val ab = Sketches.hllRegisters(df.filter(col("g") =!= "C").withColumn("g", lit("AB")),
      col("g"), col("v"), pBits = 10)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val regAB = regs.filter(col("group").isin("A", "B"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("rho"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(ab == regAB)
  }

  test("profile: all-null column still reports (n_null = n, zero registers)") {
    import spark.implicits._
    val df = Seq(("a", null: String), ("b", null: String), ("c", null: String))
      .toDF("ok", "broken")
    val rows = Sketches.profile(df, Seq("ok", "broken"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.isNullAt(5))).toMap
    // (column -> (n, n_null, n_registers, est_raw_e6 is null))
    assert(rows("ok") == (3L, 0L, 3L, false))
    assert(rows("broken") == (3L, 3L, 0L, true)) // the broken column is REPORTED
  }

  test("store swap recovery: a crash between delete and rename loses nothing") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sketch_recover").toString
    val a = (0 until 40).map(i => ("s", s"a $i")).toDF("g", "v")
    val b = (0 until 40).map(i => ("s", s"b $i")).toDF("g", "v")
    val c = (0 until 40).map(i => ("s", s"c $i")).toDF("g", "v")
    Sketches.buildHllStore(a, col("g"), col("v"), s"$tmp/hll")
    Sketches.mergeIntoHllStore(b, col("g"), col("v"), s"$tmp/hll")
    // simulate the delete-before-rename crash: main gone, committed
    // staging dir holds the full merged history
    val dir = new java.io.File(s"$tmp/hll")
    assert(dir.renameTo(new java.io.File(s"$tmp/hll.tmp")))
    Sketches.mergeIntoHllStore(c, col("g"), col("v"), s"$tmp/hll")
    val got = regSet(spark.read.parquet(s"$tmp/hll"))
    val want = regSet(Sketches.hllRegisters(
      a.unionByName(b).unionByName(c), col("g"), col("v")))
    assert(got == want) // a and b survived the simulated crash
  }

  test("sketch stores: build + merge-in-batch == one pass over the union") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sketch_store").toString
    val a = (0 until 50).map(i => ("s" + i % 3, s"text number $i")).toDF("src", "text")
    val b = (40 until 90).map(i => ("s" + i % 3, s"text number $i")).toDF("src", "text")
    Sketches.buildHllStore(a, col("src"), col("text"), s"$tmp/hll")
    Sketches.mergeIntoHllStore(b, col("src"), col("text"), s"$tmp/hll")
    val stored = regSet(spark.read.parquet(s"$tmp/hll"))
    val direct = regSet(Sketches.hllRegisters(a.unionByName(b), col("src"), col("text")))
    assert(stored == direct)
    // CMS store bootstraps on a missing path, then folds the second batch
    Sketches.mergeIntoCmsStore(a.select(col("text")), col("text"), lit(1L), s"$tmp/cms")
    Sketches.mergeIntoCmsStore(b.select(col("text")), col("text"), lit(1L), s"$tmp/cms")
    val storedC = spark.read.parquet(s"$tmp/cms")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val directC = Sketches.cmsCounters(
      a.unionByName(b).select(col("text")), col("text"), lit(1L))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(storedC == directC)
  }

  // ---- HDR quantile histogram ----

  /** Local replay of the documented bucket formula. */
  private def bucketRef(v: Long): Long =
    if (v < 64) v
    else {
      val msb = 64 - java.lang.Long.numberOfLeadingZeros(v)
      64L + (msb - 7) * 32 + ((v >> (msb - 6)) & 31L)
    }
  private def lbRef(b: Long): Long =
    if (b < 64) b else ((b - 64) % 32 + 32) << ((b - 64) / 32 + 1).toInt

  test("hdrBucket/hdrLowerBound replay locally; bounds are tight and monotone") {
    import spark.implicits._
    val vs = Seq(0L, 1L, 63L, 64L, 65L, 100L, 1000L, 123456L, 490020000L,
      Long.MaxValue / 4)
    val got = vs.toDF("v")
      .select(Sketches.hdrBucket(col("v")).as("b"))
      .withColumn("lb", Sketches.hdrLowerBound(col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    vs.zip(got).foreach { case (v, (b, lb)) =>
      assert(b == bucketRef(v), s"bucket($v)")
      assert(lb == lbRef(b), s"lb($b)")
      assert(lb <= v, s"lb <= v for $v")
      // bucket width <= lb/32 above the exact range => <=3.125% rel. error
      assert(v < 64 || v - lb <= lb / 32, s"width bound for $v")
    }
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq, "monotone buckets")
    intercept[Exception] {
      Seq(-1L).toDF("v").select(Sketches.hdrBucket(col("v"))).collect()
    }
  }

  test("histogram merge transparency and store round trip equal one full pass") {
    import spark.implicits._
    val a = (0 until 400).map(i => ("g" + i % 2, (i * 37 % 9000).toLong)).toDF("grp", "v")
    val b = (0 until 300).map(i => ("g" + i % 2, (i * 91 % 12000).toLong)).toDF("grp", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = rows(Sketches.histCounts(a.unionByName(b), col("grp"), col("v")))
    val merged = rows(Sketches.histMerge(
      Sketches.histCounts(a, col("grp"), col("v")),
      Sketches.histCounts(b, col("grp"), col("v"))))
    assert(merged == direct)
    val tmp = java.nio.file.Files.createTempDirectory("hist_store").toString + "/h"
    Sketches.mergeIntoHistStore(a, col("grp"), col("v"), tmp) // bootstrap
    Sketches.mergeIntoHistStore(b, col("grp"), col("v"), tmp) // staged fold
    assert(rows(Sketches.readHistStore(spark, tmp)) == direct)
  }

  test("histOutliers keeps exactly the rows at/above the group's p-quantile bucket floor") {
    import spark.implicits._
    val df = (1 to 300).map(i => ("g" + i % 2, (i.toLong * 17) % 20000)).toDF("grp", "v")
    val counts = Sketches.histCounts(df, col("grp"), col("v"))
    val got = Sketches.histOutliers(df, col("grp"), col("v"), counts, p = 90)
      .select(col("grp"), col("v_e6")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    // independent replay: threshold per group from histQuantiles, then filter
    val th = Sketches.histQuantiles(counts, Seq(90))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val want = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .filter { case (g, v) => v >= th(g) }.toSeq.sorted
    assert(got == want && got.nonEmpty && got.size < 300)
  }

  test("bloom: no false negatives, FPR tiny at sized m, flags match a position-set replay") {
    import spark.implicits._
    val mBits = 1L << 16
    val k = 5
    val members = (0 until 400).map(i => s"member_$i")
    val fresh = (0 until 400).map(i => s"fresh_$i")
    val words = Sketches.bloomWords(members.toDF("key"), col("key"), mBits, k)
    val flags = Sketches.bloomMightContain(
        (members ++ fresh).toDF("key"), col("key"), words, mBits, k)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(members.forall(flags(_)), "a built key tested negative")
    // expected FPR (1-e^(-kn/m))^k ~ 2e-8 here; allow a generous margin
    assert(fresh.count(flags(_)) <= 2)
    // independent replay: membership == all k positions in the built set
    val posOf = (key: String) => (0 until k).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:bloom:$key".getBytes("UTF-8"))
      (BigInt(1, md.take(6)) % mBits).toLong
    }.toSet
    val bset = members.flatMap(posOf).toSet
    (members ++ fresh).foreach { key =>
      assert(flags(key) == posOf(key).subsetOf(bset), s"flag mismatch for $key")
    }
  }

  test("bloom store: build + OR-merge equals a one-pass bitset, and the gate drops exactly the flagged rows") {
    import spark.implicits._
    val mBits = 1L << 14
    val k = 4
    val keys = (0 until 300).map(i => s"doc_$i")
    val tmp = java.nio.file.Files.createTempDirectory("bloom_store").toString + "/store"
    Sketches.buildBloomStore(keys.filter(_.hashCode % 2 == 0).toDF("key"),
      col("key"), tmp, mBits, k)
    Sketches.mergeIntoBloomStore(keys.filter(_.hashCode % 2 != 0).toDF("key"),
      col("key"), tmp, mBits, k)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePass = rows(Sketches.bloomWords(keys.toDF("key"), col("key"), mBits, k))
    assert(rows(Sketches.readBloomStore(spark, tmp)) == onePass)
    // idempotence: re-merging an already-folded batch changes nothing
    Sketches.mergeIntoBloomStore(keys.take(100).toDF("key"), col("key"), tmp, mBits, k)
    assert(rows(Sketches.readBloomStore(spark, tmp)) == onePass)
    // gate == the complement of the flag set over a mixed probe stream
    val probes = (keys.take(50) ++ (0 until 50).map(i => s"new_$i")).toDF("key")
    val store = Sketches.readBloomStore(spark, tmp)
    val kept = Sketches.bloomGate(probes, col("key"), store, mBits, k)
      .collect().map(_.getString(0)).toSet
    val flagged = Sketches.bloomMightContain(probes, col("key"), store, mBits, k)
      .filter(col("might_contain")).collect().map(_.getString(0)).toSet
    assert(kept == probes.collect().map(_.getString(0)).toSet -- flagged)
    assert(keys.take(50).forall(flagged.contains))
  }

  test("counting bloom: forget == a filter built without the deleted keys") {
    import graft.operators.Sketches
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("cbloom").toString
    Sketches.initCountingBloomStore(spark, dir, mBits = 1L << 16, k = 5)
    Sketches.appendCountingBloomBatch(docs.filter(col("doc_id") % 10 === 0),
      col("text"), dir, batchId = 0L)
    Sketches.appendCountingBloomBatch(docs.filter(col("doc_id") % 10 === 5),
      col("text"), dir, batchId = 1L)
    // before deletion: flags == the plain-Bloom gate over the same keys
    val keys = docs.filter(col("doc_id") % 5 === 0)
    val wordsAll = Sketches.bloomWords(keys, col("text"), 1L << 16, 5)
    val plainAll = Sketches.bloomMightContain(docs, col("text"), wordsAll,
        1L << 16, 5)
      .select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cbAll = Sketches.countingBloomMightContain(docs, col("text"), dir)
      .select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(cbAll == plainAll && cbAll.values.exists(identity))
    // forget the %10=5 half: flags == a plain filter over the remainder
    Sketches.deleteFromCountingBloom(docs.filter(col("doc_id") % 10 === 5),
      col("text"), dir, batchId = 0L)
    val wordsRem = Sketches.bloomWords(docs.filter(col("doc_id") % 10 === 0),
      col("text"), 1L << 16, 5)
    val plainRem = Sketches.bloomMightContain(docs, col("text"), wordsRem,
        1L << 16, 5)
      .select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cbRem = Sketches.countingBloomMightContain(docs, col("text"), dir)
      .select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(cbRem == plainRem)
    assert(cbRem != cbAll, "deletion should change some verdicts")
    // the gate keeps exactly the not-flagged rows
    val gated = Sketches.countingBloomGate(docs, col("text"), dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(gated == cbRem.collect { case (id, false) => id }.toSet)
    // multiset: inserting a duplicate key twice survives one deletion
    val dup = spark.createDataFrame(Seq((1L, "dup text"), (2L, "dup text")))
      .toDF("id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("cbloom2").toString
    Sketches.initCountingBloomStore(spark, dir2, mBits = 1L << 12, k = 3)
    Sketches.appendCountingBloomBatch(dup, col("text"), dir2, 0L)
    Sketches.deleteFromCountingBloom(dup.filter(col("id") === 1L),
      col("text"), dir2, 0L)
    val still = Sketches.countingBloomMightContain(
        dup.filter(col("id") === 2L), col("text"), dir2)
      .select(col("might_contain")).head().getBoolean(0)
    assert(still)
    intercept[IllegalArgumentException] {
      Sketches.appendCountingBloomBatch(dup, col("text"), dir2, -1L)
    }
  }

  test("histQuantiles returns the exact bucket of the rank-ceil(p·n/100) value") {
    import spark.implicits._
    val vals = (1 to 500).map(i => (i.toLong * i) % 50000).sorted
    val df = vals.map(("g", _)).toDF("grp", "v")
    val ps = Seq(1, 50, 90, 99, 100)
    val got = Sketches.histQuantiles(
        Sketches.histCounts(df, col("grp"), col("v")), ps)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    ps.foreach { p =>
      val rank = (p * vals.size + 99) / 100 // ceil
      val vRank = vals(rank - 1)
      assert(got(p)._1 == bucketRef(vRank), s"p$p bucket")
      assert(got(p)._2 == lbRef(bucketRef(vRank)), s"p$p lb")
    }
  }
}
