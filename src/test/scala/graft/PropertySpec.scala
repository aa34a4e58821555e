package graft

import graft.functions.GeoOps
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests of the predicate kernel (SURVEY §5 plan): interval algebra
 * and predicate symmetry laws over 500 seeded random spatio-temporal
 * objects, checked directly against [[GeoOps.relate]] — the single
 * evaluation path every expression routes through.
 */
class PropertySpec extends AnyFunSuite {

  private val allOps =
    Seq(GeoOps.INTERSECTS, GeoOps.CONTAINS, GeoOps.CONTAINEDBY, GeoOps.COVERS, GeoOps.COVEREDBY)

  private def sto(x: Double, y: Double, t: Option[(Long, Option[Long])]): GenericInternalRow = {
    val g = GeoOps.pointWkb(x, y)
    t match {
      case None => new GenericInternalRow(Array[Any](g, null, null))
      case Some((s, e)) => new GenericInternalRow(Array[Any](g, Long.box(s), e.map(Long.box).orNull))
    }
  }

  private val rnd = new scala.util.Random(42)
  private def genSto(): GenericInternalRow = {
    val x = rnd.nextInt(21).toDouble - 10 // small domain => frequent collisions
    val y = rnd.nextInt(21).toDouble - 10
    val t = rnd.nextInt(4) match {
      case 0 => None
      case 1 => val s = rnd.nextInt(100).toLong; Some((s, Some(s)))          // instant
      case 2 => val s = rnd.nextInt(100).toLong; Some((s, Some(s + rnd.nextInt(50)))) // closed
      case _ => Some((rnd.nextInt(100).toLong, None))                        // open
    }
    sto(x, y, t)
  }
  private val samples = Seq.fill(500)((genSto(), genSto()))

  test("contains/containedBy and covers/coveredBy are inverse relations") {
    samples.foreach { case (a, b) =>
      assert(GeoOps.relate(a, b, GeoOps.CONTAINS) == GeoOps.relate(b, a, GeoOps.CONTAINEDBY))
      assert(GeoOps.relate(a, b, GeoOps.COVERS) == GeoOps.relate(b, a, GeoOps.COVEREDBY))
    }
  }

  test("intersects is symmetric") {
    samples.foreach { case (a, b) =>
      assert(GeoOps.relate(a, b, GeoOps.INTERSECTS) == GeoOps.relate(b, a, GeoOps.INTERSECTS))
    }
  }

  test("reflexivity: intersects always; contains/covers unless open-ended time") {
    samples.map(_._1).foreach { a =>
      assert(GeoOps.relate(a, a, GeoOps.INTERSECTS))
      // an open-ended containee is contained/covered by nothing — its end is
      // undefined (reference Interval.scala:37-38; covers shares the gate)
      val openEnd = !a.isNullAt(1) && a.isNullAt(2)
      assert(GeoOps.relate(a, a, GeoOps.CONTAINS) == !openEnd)
      assert(GeoOps.relate(a, a, GeoOps.COVERS) == !openEnd)
    }
  }

  test("mixed temporal presence is always false; containment implies intersection") {
    var mixedSeen = 0
    samples.foreach { case (a, b) =>
      val aT = !a.isNullAt(1); val bT = !b.isNullAt(1)
      if (aT != bT) {
        mixedSeen += 1
        allOps.foreach(op => assert(!GeoOps.relate(a, b, op)))
      }
      if (GeoOps.relate(a, b, GeoOps.CONTAINS))
        assert(GeoOps.relate(a, b, GeoOps.INTERSECTS))
    }
    assert(mixedSeen > 50) // the law was actually exercised
  }

  test("distances: symmetry, non-negativity, identity") {
    samples.foreach { case (a, b) =>
      val d = GeoOps.centroidDistance(a, b)
      assert(d >= 0 && d == GeoOps.centroidDistance(b, a))
      // directed Hausdorff (reference shausdorff): non-negative, zero on self
      assert(GeoOps.hausdorffDistance(a, b) >= 0)
      assert(GeoOps.hausdorffDistance(a, a) == 0.0)
      assert(GeoOps.centroidDistance(a, a) == 0.0)
    }
  }

  test("text kernels match naive reference implementations on random inputs") {
    import graft.functions.TextOps
    import org.apache.spark.unsafe.types.UTF8String
    val trnd = new scala.util.Random(7)
    // alphabet includes the token separator and a multi-byte char so the
    // code-point walk and the split path both get exercised
    val alphabet = "ab z.é"
    def randText(): String =
      (0 until trnd.nextInt(40)).map(_ => alphabet(trnd.nextInt(alphabet.length))).mkString
    def naiveFp(s: String): Long = {
      val cps = s.codePoints().toArray.map(_.toLong)
      if (cps.length == 0) 0L
      else if (cps.length < 5) cps.foldLeft(0L)((acc, c) => acc * 257L + c)
      else (0 to cps.length - 5).map { i =>
        cps(i) * 4362470401L + cps(i + 1) * 16974593L + cps(i + 2) * 66049L +
          cps(i + 3) * 257L + cps(i + 4)
      }.min
    }
    def naiveRep(s: String): Seq[Long] = {
      val ws = s.split(" ", -1).toSeq
      def grams(g: Int) = (0 to ws.length - g).map(i => ws.slice(i, i + g).mkString(" ")).distinct.size
      Seq(ws.length.toLong, grams(2).toLong, grams(3).toLong,
        ws.groupBy(identity).values.map(_.size).max.toLong)
    }
    (0 until 300).foreach { _ =>
      val s = randText()
      val u = UTF8String.fromString(s)
      assert(TextOps.rollingMinFp(u) == naiveFp(s), s"fp mismatch on '$s'")
      val st = TextOps.repetitionStats(u)
      assert((0 until 4).map(st.getLong) == naiveRep(s), s"rep mismatch on '$s'")
    }
  }

  test("rasterPixels: fill == even-odd of pixel centers vs JTS on random polygons") {
    // ground truth: a pixel is filled iff its center is inside the polygon
    // (JTS contains on the center point); the kernel's scanline must agree
    // on every canvas pixel for arbitrary simple polygons — this covers the
    // edge-interpolation, span-rounding, and envelope-clamp arithmetic
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val prnd = new scala.util.Random(19)
    val W = 12; val H = 12
    (0 until 60).foreach { trial =>
      // random star-shaped (hence simple) polygon around a random center
      val cx = 2 + prnd.nextDouble() * 8; val cy = 2 + prnd.nextDouble() * 8
      val nv = 3 + prnd.nextInt(6)
      val angles = Array.fill(nv)(prnd.nextDouble() * 2 * math.Pi).sorted
      val pts = angles.map { a =>
        val r = 0.7 + prnd.nextDouble() * 4.0
        new org.locationtech.jts.geom.Coordinate(cx + r * math.cos(a), cy + r * math.sin(a))
      }
      // need distinct consecutive angles for a valid ring; skip degenerates
      if (angles.distinct.length == nv) {
        val ring = pts :+ pts(0)
        val poly = gf.createPolygon(ring)
        if (poly.isValid) {
          val sto = new GenericInternalRow(Array[Any](GeoOps.writeGeom(poly), null, null))
          val got = GeoOps.rasterPixels(sto, 0, 0, W.toDouble, H.toDouble,
              W, H, fill = true, pointSize = 1)
            .map(p => ((p >> 32).toInt, (p & 0xffffffffL).toInt)).toSet
          val want = (for {
            px <- 0 until W; py <- 0 until H
            if poly.contains(gf.createPoint(
              new org.locationtech.jts.geom.Coordinate(px + 0.5, py + 0.5)))
          } yield (px, py)).toSet
          assert(got == want,
            s"trial $trial: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)} wkt=$poly")
        }
      }
    }
  }

  test("rasterPixels: outline pixels always within canvas and cover ring vertices") {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val prnd = new scala.util.Random(29)
    val W = 10; val H = 10
    (0 until 60).foreach { _ =>
      // random segments, some with far-outlier endpoints (the clip path)
      val big = prnd.nextInt(3) == 0
      def coord() =
        if (big && prnd.nextBoolean()) new org.locationtech.jts.geom.Coordinate(
          (prnd.nextDouble() - 0.5) * 1e7, (prnd.nextDouble() - 0.5) * 1e7)
        else new org.locationtech.jts.geom.Coordinate(
          prnd.nextDouble() * 14 - 2, prnd.nextDouble() * 14 - 2)
      val a = coord(); val b = coord()
      val line = gf.createLineString(Array(a, b))
      val sto = new GenericInternalRow(Array[Any](GeoOps.writeGeom(line), null, null))
      val got = GeoOps.rasterPixels(sto, 0, 0, W.toDouble, H.toDouble,
          W, H, fill = false, pointSize = 1)
        .map(p => ((p >> 32).toInt, (p & 0xffffffffL).toInt))
      // every inked pixel is on-canvas (sorted + deduped is the contract)
      got.foreach { case (x, y) =>
        assert(x >= 0 && x < W && y >= 0 && y < H, s"off-canvas ink ($x,$y) for $line")
      }
      assert(got.toSeq == got.toSeq.sorted && got.toSet.size == got.length)
      // an on-canvas vertex's own pixel is always inked (walks start there)
      Seq(a, b).foreach { c =>
        val px = math.floor(c.x).toInt; val py = math.floor(c.y).toInt
        if (px >= 0 && px < W && py >= 0 && py < H)
          assert(got.contains((px, py)), s"vertex pixel ($px,$py) not inked for $line")
      }
    }
  }

  test("redactPii leaves no digit-bearing PII shape on random PII-dense text") {
    // The digit patterns (IP, long number, SSN, phone) are a true
    // post-condition: replacement tokens contain no digits, so no pass can
    // mint a new digit shape for a later (or earlier) pattern to miss. Full
    // idempotence deliberately NOT asserted: regex redaction can splice an
    // email shape across a placeholder boundary ('<EMAIL>@x.com'), which is
    // inherent to the technique, documented, and digit-free.
    import org.apache.spark.sql.functions.col
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val prnd = new scala.util.Random(11)
    val frags = Seq("a", "bb", " ", "-", ".", "@", "(", ")", "+", "555", "12",
      "4111111111111111", "10.1.2.3", "123-45-6789", "x@y.co", "(212) 555-0175",
      "+1 555-123-4567", "007", "99999999999999999999")
    def randDoc(): String =
      (0 until 1 + prnd.nextInt(12)).map(_ => frags(prnd.nextInt(frags.length))).mkString
    val docs = (0 until 400).map(i => (i.toLong, randDoc()))
    val out = graft.operators.TextAnalysis
      .redactPii(docs.toDF("doc_id", "text"), col("text"))
      .select(col("text_redacted")).collect().map(_.getString(0))
    val digitPatterns = {
      import graft.operators.TextAnalysis.Pii._
      Seq(Ipv4, LongNumber, Ssn, Phone).map(_.r)
    }
    out.foreach { t =>
      digitPatterns.foreach { p =>
        assert(p.findFirstIn(t).isEmpty, s"pattern $p survives in '$t'")
      }
    }
  }

  test("dsirScores == naive local replay on random corpora (exact integers)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.unsafe.types.UTF8String
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val drnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "", "zzz")
    for (trial <- 0 until 3) {
      val b = 1 << (4 + drnd.nextInt(4)) // 16..128 buckets
      val docs = (0 until (20 + drnd.nextInt(20))).map { i =>
        (i.toLong, Seq.fill(1 + drnd.nextInt(12))(vocab(drnd.nextInt(vocab.size))).mkString(" "),
          if (drnd.nextBoolean()) "t" else "r")
      }
      def feats(text: String): Seq[Int] = {
        val ws = text.split(" ", -1).toSeq
        (ws ++ ws.zip(ws.drop(1)).map { case (a2, b2) => s"$a2 $b2" }).map(f =>
          java.lang.Math.floorMod(
            graft.functions.TextOps.hashUtf8(UTF8String.fromString(f), 42L), b.toLong).toInt)
      }
      val tCnt = docs.filter(_._3 == "t").flatMap(d => feats(d._2))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val rCnt = docs.flatMap(d => feats(d._2))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val tt = tCnt.values.sum; val rr = rCnt.values.sum
      def ratio(bk: Int): Long =
        ((BigInt(tCnt.getOrElse(bk, 0L) + 1) * (rr + b) * 1000000) /
          (BigInt(rCnt(bk) + 1) * (tt + b))).toLong
      val want = docs.map(d => d._1 -> feats(d._2).map(ratio).sum).toMap
      val df = docs.toDF("id", "text", "kind")
      // a trial can draw zero target docs — the operator must still work
      // (empty target => uniform p, scores rank by 1/q alone)
      val got = graft.operators.Pipeline.dsirScores(df, col("id"), col("text"),
          df.filter(col("kind") === "t"), col("text"), buckets = b)
        .select(col("id"), col("dsir_score_e6")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"trial=$trial buckets=$b docs=${docs.size}")
    }
  }

  test("groupPercentiles == local sort on random group sizes incl. singletons") {
    import org.apache.spark.sql.functions.col
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val prnd = new scala.util.Random(37)
    for (trial <- 0 until 3) {
      val groups = (0 until (2 + prnd.nextInt(4))).map(g => s"g$g")
      val rows = groups.flatMap { g =>
        (0 until (1 + prnd.nextInt(9))).map(_ => (g, prnd.nextInt(20).toLong))
      }
      val percents = Seq(0, 10, 50, 90, 100)
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        percents.map(p => (g, p) -> sorted((p * (sorted.length - 1)) / 100))
      }
      val got = graft.operators.Pipeline.groupPercentiles(
          rows.toDF("g", "v"), col("g"), col("v"), percents, groupName = "g")
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got == want, s"trial=$trial rows=${rows.size}")
    }
  }

  test("kmeans == naive local Lloyd on random corpora (exact, incl. quantization)") {
    // the operator's whole contract — seed order, tie direction, 1e-6 grid
    // snap, empty-cluster drop, final-assignment output — re-implemented
    // naively on the driver; any drift in either copy fails exactly
    import org.apache.spark.sql.functions.col
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val krnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val n = 40 + krnd.nextInt(40); val dim = 1 + krnd.nextInt(4)
      val k = 2 + krnd.nextInt(3); val iters = krnd.nextInt(4)
      val data = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)((krnd.nextInt(2000) - 1000) / 100.0f)))
      def d2(a: Array[Double], b: Array[Double]) =
        a.indices.map(j => (a(j) - b(j)) * (a(j) - b(j))).sum
      def assign(e: Array[Double], cs: Seq[(Int, Array[Double])]): (Int, Double) =
        cs.map { case (c, ce) => (d2(e, ce), c) }.minBy(x => (x._1, x._2)).swap
      var cents: Seq[(Int, Array[Double])] =
        data.sortBy(_._1).take(k).zipWithIndex.map { case ((_, e), i) =>
          (i, e.map(_.toDouble)) }
      for (_ <- 0 until iters) {
        val byC = data.groupBy { case (_, e) => assign(e.map(_.toDouble), cents)._1 }
        cents = byC.toSeq.sortBy(_._1).map { case (c, g) =>
          (c, Array.tabulate(dim)(j =>
            math.floor(g.map(_._2(j).toDouble).sum / g.size * 1e6 + 0.5) / 1e6))
        }
      }
      val exp = data.map { case (id, e) =>
        val (c, d) = assign(e.map(_.toDouble), cents); id -> ((c, d)) }.toMap
      val got = graft.operators.Similarity
        .kmeans(data.toDF("id", "vec"), col("id"), col("vec"), k, iters)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      assert(got == exp, s"trial=$trial n=$n dim=$dim k=$k iters=$iters")
    }
  }
}
