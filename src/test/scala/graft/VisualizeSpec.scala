package graft

import graft.operators.Visualize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO

class VisualizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("renderPng produces a decodable image with ink where the data is") {
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    val png = Visualize.renderPng(c, col("cx"), col("cy"), 0, 0, 1000, 1000, 64, 64)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 64 && img.getHeight == 64)
    var lit0 = 0
    for (x <- 0 until 64; y <- 0 until 64)
      if (img.getRaster.getSample(x, y, 0) > 0) lit0 += 1
    assert(lit0 > 100, s"expected many lit pixels, got $lit0") // 1500 points spread out
  }

  test("empty world region renders an all-black image") {
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    val png = Visualize.renderPng(c, col("cx"), col("cy"), 5000, 5000, 6000, 6000, 16, 16)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    var lit0 = 0
    for (x <- 0 until 16; y <- 0 until 16)
      if (img.getRaster.getSample(x, y, 0) > 0) lit0 += 1
    assert(lit0 == 0)
  }

  private def inked(wkt: String, fill: Boolean = false, pointSize: Int = 1,
                    w: Int = 10, h: Int = 10): Set[(Int, Int)] = {
    import spark.implicits._
    val df = Seq(wkt).toDF("wkt")
      .select(graft.functions.stf.st_geomfromwkt(col("wkt")).as("g"))
    Visualize.geomBins(df, col("g"), 0.0, 0.0, w.toDouble, h.toDouble, w, h,
        fill, pointSize)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
  }

  test("geomBins: diagonal linestring inks the Bresenham pixels") {
    assert(inked("LINESTRING (0.5 0.5, 4.5 4.5)") ==
      Set((0, 0), (1, 1), (2, 2), (3, 3), (4, 4)))
  }

  test("geomBins: a far-outlier vertex clips to the canvas instead of failing") {
    // (0.5,0.5) -> (1e7,1e7): the continuous line is y=x, so the clipped
    // walk still inks the full diagonal — one bad GPS point must neither
    // abort the render nor drop the visible part of the segment
    assert(inked("LINESTRING (0.5 0.5, 10000000 10000000)") ==
      (0 until 10).map(i => (i, i)).toSet)
    // bounding box overlaps the canvas in both axes but the continuous
    // line passes outside it (corner near-miss): the clip rejects cleanly
    assert(inked("LINESTRING (8.5 10000000, 10000000 8.5)").isEmpty)
    // endpoints straddling more than 2^31 pixels: Int subtraction would
    // wrap the clip's direction vector and drop (or misdraw) the line —
    // the horizontal crossing must still ink its full row
    assert(inked("LINESTRING (-3000000000 4.5, 3000000000 4.5)") ==
      (0 until 10).map(i => (i, 4)).toSet)
  }

  test("geomBins: polygon outline inks the pixel-rect border") {
    val got = inked("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    val border = (for (x <- 1 to 3; y <- 1 to 3 if x == 1 || x == 3 || y == 1 || y == 3)
      yield (x, y)).toSet
    assert(got == border, s"got $got")
  }

  test("geomBins: filled polygon inks interior pixel centers (even-odd)") {
    // box (1,1)-(3,3): centers (px+0.5, py+0.5) strictly inside => px,py in {1,2}
    assert(inked("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", fill = true) ==
      Set((1, 1), (2, 1), (1, 2), (2, 2)))
    // right triangle (0,0)-(4,0)-(0,4): hypotenuse x = 4 - y cuts each scanline
    assert(inked("POLYGON ((0 0, 4 0, 0 4, 0 0))", fill = true) ==
      Set((0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (0, 2)))
  }

  test("geomBins: point dilation and canvas clipping") {
    assert(inked("POINT (5.2 5.7)", pointSize = 2) ==
      Set((5, 5), (6, 5), (5, 6), (6, 6)))
    // dilation square clips at the canvas edge instead of wrapping
    assert(inked("POINT (9.5 9.5)", pointSize = 3) == Set((9, 9)))
    // fully off-canvas geometry inks nothing
    assert(inked("LINESTRING (20 20, 30 25)") == Set.empty)
    // an absurd pointSize is bounded by the canvas, not by pointSize^2
    // loop iterations (this would spin ~4e18 rejected ink calls unclamped),
    // and a square overhanging the origin clips instead of wrapping
    assert(inked("POINT (0 0)", pointSize = Int.MaxValue) ==
      (for (x <- 0 until 10; y <- 0 until 10) yield (x, y)).toSet)
    // px = floor(-2.5) = -3, py = floor(-1.5) = -2, square 4 wide: the
    // on-canvas remainder is x in {0}, y in {0, 1}
    assert(inked("POINT (-2.5 -1.5)", pointSize = 4) == Set((0, 0), (0, 1)))
  }

  test("InkBuf: an abandoned draw cannot leak dedup bits into the next call") {
    // a draw that throws never reaches closeSorted; Spark reuses executor
    // threads, so the next row on this thread must still see every pixel
    val g = graft.functions.GeoOps
    val b = new g.InkBuf
    b.open(100)
    b.add(3, g.pack(3, 0)) // partial draw, then (simulated) throw — no close
    b.open(100)
    b.add(3, g.pack(3, 0))
    assert(b.closeSorted(10).toSeq == Seq(g.pack(3, 0)))
    // and the normal path still dedups within one draw
    b.open(100)
    b.add(3, g.pack(3, 0)); b.add(3, g.pack(3, 0)); b.add(7, g.pack(7, 0))
    assert(b.closeSorted(10).toSeq == Seq(g.pack(3, 0), g.pack(7, 0)).sorted)
  }

  test("geomBins: multipolygon recurses and cnt counts overdraw") {
    import spark.implicits._
    // two rects sharing the (5,*) edge column: cnt = 2 there, 1 elsewhere
    val df = Seq("POLYGON ((1 1, 5 1, 5 3, 1 3, 1 1))",
                 "POLYGON ((5 1, 8 1, 8 3, 5 3, 5 1))").toDF("wkt")
      .select(graft.functions.stf.st_geomfromwkt(col("wkt")).as("g"))
    val rows = Visualize.geomBins(df, col("g"), 0.0, 0.0, 10.0, 10.0, 10, 10)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(rows((5, 1)) == 2 && rows((5, 2)) == 2 && rows((5, 3)) == 2)
    assert(rows((1, 1)) == 1 && rows((8, 2)) == 1)
    // same two boxes as one MULTIPOLYGON row: shared pixels dedup per row
    val mp = Seq("MULTIPOLYGON (((1 1, 5 1, 5 3, 1 3, 1 1)), ((5 1, 8 1, 8 3, 5 3, 5 1)))")
      .toDF("wkt").select(graft.functions.stf.st_geomfromwkt(col("wkt")).as("g"))
    val mrows = Visualize.geomBins(mp, col("g"), 0.0, 0.0, 10.0, 10.0, 10, 10)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(mrows.values.forall(_ == 1L))
    assert(mrows.keySet == rows.keySet)
  }

  test("geomBins over point geometries == coordinate bins (differential)") {
    val e = Tables.eventPts(spark, "/root/testdata/sf0.001")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val viaGeom = m(Visualize.geomBins(e, col("e_geo"), 0.0, 0.0, 512.0, 512.0, 32, 32))
    val viaCoords = m(Visualize.bins(e, col("ex"), col("ey"), 0.0, 0.0, 512.0, 512.0, 32, 32))
    assert(viaGeom == viaCoords && viaGeom.nonEmpty)
  }

  test("rasterBins places tile pixels at their WORLD position (not the reference's origin overdraw)") {
    import spark.implicits._
    // one 2x2 tile anchored at ulx=4, uly=8, pixel_width=2: data row-major
    // from top — pixel (r=0,c=0)=10 covers x[4,6) y[6,8) -> center (5,7);
    // (r=1,c=1)=40 covers x[6,8) y[4,6) -> center (7,5)
    val tile = Seq((4.0, 8.0, 2, 2, 2.0, Seq(10L, 20L, 30L, 40L)))
      .toDF("ulx", "uly", "width", "height", "pixel_width", "data")
    // canvas [0,8)^2 at 8x8: canvas pixel == 1 world unit
    val got = operators.Visualize.rasterBins(tile, 0.0, 0.0, 8.0, 8.0, 8, 8)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == Map((5, 7) -> 10L, (7, 7) -> 20L, (5, 5) -> 30L, (7, 5) -> 40L), got.toString)
    // overlapping tiles: canvas pixel keeps the max value
    val two = Seq(
      (0.0, 2.0, 1, 1, 2.0, Seq(3L)),
      (0.0, 2.0, 1, 1, 2.0, Seq(9L))).toDF("ulx", "uly", "width", "height", "pixel_width", "data")
    val m = operators.Visualize.rasterBins(two, 0.0, 0.0, 2.0, 2.0, 1, 1)
      .collect().map(r => r.getLong(2))
    assert(m.toSeq == Seq(9L))
    // PNG render: brightest pixel at the max-value position, decodable
    val png = operators.Visualize.renderRasterPng(tile, 0.0, 0.0, 8.0, 8.0, 8, 8)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getRaster.getSample(7, 8 - 1 - 5, 0) == 255) // v=40 -> full intensity
    assert(img.getRaster.getSample(5, 8 - 1 - 7, 0) == (255 * 10 / 40))
    // negative values darken on a min-anchored scale instead of wrapping
    // through setSample's & 0xFF (a -10 rendered near-white before); the
    // non-negative pixels above keep the 0-anchored scale bit-identical
    val neg = Seq((0.0, 2.0, 2, 1, 1.0, Seq(-10L, 10L)))
      .toDF("ulx", "uly", "width", "height", "pixel_width", "data")
    val nimg = ImageIO.read(new java.io.ByteArrayInputStream(
      operators.Visualize.renderRasterPng(neg, 0.0, 1.0, 2.0, 2.0, 2, 1)))
    assert(nimg.getRaster.getSample(0, 0, 0) == 0)   // min value -> black
    assert(nimg.getRaster.getSample(1, 0, 0) == 255) // max value -> white
  }

  test("renderGeomPng: ink lands at flipped y, background preserved elsewhere") {
    import spark.implicits._
    val df = Seq("POINT (2.5 1.5)").toDF("wkt")
      .select(graft.functions.stf.st_geomfromwkt(col("wkt")).as("g"))
    val bg = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (x <- 0 until 10; y <- 0 until 10) bg.setRGB(x, y, 0xFF0000FF) // blue
    val png = Visualize.renderGeomPng(df, col("g"), 0.0, 0.0, 10.0, 10.0, 10, 10,
      color = 0xFFFF0000, background = bg)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    // world (2.5, 1.5) -> pixel (2, 1) -> image row h-1-1 = 8
    assert(img.getRGB(2, 8) == 0xFFFF0000)
    assert(img.getRGB(0, 0) == 0xFF0000FF)
    assert(img.getRGB(2, 1) == 0xFF0000FF)
  }

  test("outputType parity: jpg renders decode; unknown formats fail loudly") {
    import spark.implicits._
    val df = Seq("POINT (2.5 1.5)").toDF("wkt")
      .select(graft.functions.stf.st_geomfromwkt(col("wkt")).as("g"))
    // ARGB canvas flattens for the jpeg writer instead of erroring
    val jpg = Visualize.renderGeomPng(df, col("g"), 0.0, 0.0, 10.0, 10.0, 10, 10,
      format = "jpg")
    val img = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth == 10 && img.getHeight == 10)
    val e = intercept[IllegalArgumentException] {
      Visualize.renderGeomPng(df, col("g"), 0.0, 0.0, 10.0, 10.0, 10, 10,
        format = "not-a-format")
    }
    assert(e.getMessage.contains("no image writer"), e.getMessage)
  }

  test("reference world-map render replays end-to-end (VisualizationTest:40-49)") {
    import spark.implicits._
    // the reference's own test: poly.csv through worldProj + fillPolygon at
    // 4096x2048 over the mercator.jpg background — same fixture, same
    // canvas size (which is why the canvas cap admits 2^23 pixels)
    val wkt = scala.util.Using.resource(scala.io.Source.fromFile(
      "/root/reference/src/test/resources/poly.csv"))(_.mkString.trim)
    val bg = ImageIO.read(new java.io.File(
      "/root/reference/src/test/resources/mercator.jpg"))
    def render(w: Int, h: Int) = {
      val df = Seq(wkt).toDF("wkt")
        .select(graft.functions.stf.st_mercator(
          graft.functions.stf.st_geomfromwkt(col("wkt")), lit(w), lit(h)).as("m"))
      ImageIO.read(new java.io.ByteArrayInputStream(
        Visualize.renderGeomPng(df, col("m"), 0, 0, w.toDouble, h.toDouble,
          w, h, fill = true, background = bg, flipY = false)))
    }
    // the reference's exact 4096x2048 call renders without error (this is
    // all its own test asserts — and at that aspect its projection, whose
    // y-scale derives from the WIDTH, puts everything north of ~27°N above
    // the canvas, so the poly fixture lands no ink; background only)
    val wide = render(4096, 2048)
    assert(wide.getWidth == 4096 && wide.getHeight == 2048)
    // at a square aspect the polygon (northwest North America) is on-canvas
    // and the even-odd fill inks a large region over the background
    val sq = render(2048, 2048)
    var red = 0
    for (x <- 0 until 2048 by 4; y <- 0 until 2048 by 4)
      if (sq.getRGB(x, y) == 0xFFFF0000) red += 1
    assert(red > 500, s"filled region too small: $red sampled red pixels")
    // …and pixels far outside it keep the background (southern hemisphere)
    assert(sq.getRGB(1500, 1900) != 0xFFFF0000)
  }

  test("st_mercator matches the reference projection formula") {
    import spark.implicits._
    val (w, h) = (360, 180)
    val df = Seq("POINT (10.0 45.0)").toDF("wkt")
      .select(graft.functions.stf.st_mercator(
        graft.functions.stf.st_geomfromwkt(col("wkt")), lit(w), lit(h)).as("m"))
    val x = df.select(graft.functions.stf.st_x(col("m"))).collect()(0).getDouble(0)
    val y = df.select(graft.functions.stf.st_y(col("m"))).collect()(0).getDouble(0)
    // driver-side recomputation of the documented constants/formula
    val mapLngLeft = -180.85; val mapLngDelta = 180.0 - mapLngLeft
    val worldMapWidth = ((w / mapLngDelta) * 360.0) / (2.0 * math.Pi)
    val latBottomRad = -82.05 * math.Pi / 180.0
    val offY = worldMapWidth / 2.0 *
      math.log((1.0 + math.sin(latBottomRad)) / (1.0 - math.sin(latBottomRad)))
    val latRad = 45.0 * math.Pi / 180.0
    val expX = (10.0 - mapLngLeft) * (w / mapLngDelta)
    val expY = h - (worldMapWidth / 2.0 *
      math.log((1.0 + math.sin(latRad)) / (1.0 - math.sin(latRad))) - offY)
    assert(math.abs(x - expX) < 1e-9 && math.abs(y - expY) < 1e-9, s"($x,$y) vs ($expX,$expY)")
  }
}
