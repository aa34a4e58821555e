package graft

import graft.operators.Raster
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Raster algebra unit tests — tile semantics ports of the reference's
  * TileTest/RasterTest contracts (SURVEY §5 style #5). */
class RasterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 points in a 2x2-pixel tile world (pw=1, tiles 2x2 px => extent 2x2)
  private def pts = Seq(
    (0.5, 0.5), (0.5, 0.5), (1.5, 0.5), (0.5, 1.5)
  ).toDF("x", "y")

  test("rasterize: row-major from top, upper-left anchored") {
    val t = Raster.rasterize(pts, col("x"), col("y"), 1.0, 2, 2).collect()
    assert(t.length == 1)
    val r = t(0)
    assert(r.getAs[Double]("ulx") == 0.0 && r.getAs[Double]("uly") == 2.0)
    // top row: (0,1)->1 point at (0.5,1.5), (1,1)->0; bottom row: 2, 1
    assert(r.getSeq[Long](r.fieldIndex("data")) == Seq(1L, 0L, 2L, 1L))
  }

  test("filterClip extracts the pixel sub-rectangle") {
    val world = Seq.tabulate(16)(i => ((i % 4) + 0.5, (i / 4) + 0.5)).toDF("x", "y")
    val tiles = Raster.rasterize(world, col("x"), col("y"), 1.0, 4, 4)
    val clipped = Raster.filterClip(tiles, 1.0, 1.0, 3.0, 3.0).collect()(0)
    assert(clipped.getAs[Double]("ulx") == 1.0 && clipped.getAs[Double]("uly") == 3.0)
    assert(clipped.getAs[Int]("width") == 2 && clipped.getAs[Int]("height") == 2)
    assert(clipped.getSeq[Long](clipped.fieldIndex("data")) == Seq(1L, 1L, 1L, 1L))
  }

  test("countValue / hasValue with SMA prefilter") {
    val tiles = Raster.rasterize(pts, col("x"), col("y"), 1.0, 2, 2)
    assert(Raster.countValue(tiles, 1L).collect()(0).getLong(0) == 2L)
    assert(Raster.countValue(tiles, 2L).collect()(0).getLong(0) == 1L)
    assert(Raster.hasValue(tiles, 2L))
    assert(!Raster.hasValue(tiles, 7L))
  }

  test("fromImageFiles round-trips PNGs written by the renderer") {
    // full circle: render points -> PNG files named tx_ty -> load as tiles
    val dir = java.nio.file.Files.createTempDirectory("graft_png").toFile
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(1, 0, 0, 200) // col 1, top row
    img.getRaster.setSample(3, 3, 0, 50)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "2_5.png"))
    val tiles = Raster.fromImageFiles(spark, dir.getAbsolutePath, pixelWidth = 10.0)
    val t = tiles.collect()(0)
    assert(t.getAs[Double]("ulx") == 2 * 4 * 10.0 && t.getAs[Double]("uly") == 6 * 4 * 10.0)
    assert(t.getAs[Int]("width") == 4 && t.getAs[Int]("height") == 4)
    val data = t.getSeq[Long](t.fieldIndex("data"))
    assert(data(1) == 200L && data(15) == 50L && data.sum == 250L)
    // loaded tiles compose with the rest of the algebra
    assert(Raster.countValue(tiles, 200L).collect()(0).getLong(0) == 1L)
  }

  test("joinVectorAgg computes a per-match tile aggregate") {
    import org.apache.spark.sql.functions.array_max
    val tiles = Raster.rasterize(pts, col("x"), col("y"), 1.0, 2, 2)
    val vec = Seq((1L, 0.0, 0.0, 2.0, 2.0)).toDF("vid", "x0", "y0", "x1", "y1")
      .withColumn("vgeo", graft.functions.stf.st_box(col("x0"), col("y0"), col("x1"), col("y1")))
    val joined = Raster.joinVectorAgg(tiles, vec, col("vgeo"),
      graft.operators.JoinPredicate.Intersects, cellSize = 2.0, agg = array_max)
    val r = joined.collect()(0)
    assert(r.getAs[Long]("tile_agg") == 2L) // max pixel count in the tile
  }

  test("bucketHistogram: equi-width buckets with trailing clamp and zero rows") {
    // values 1..6 over two tiles; B=4 -> step=ceil(5/4)=2: [1,2] [3,4] [5,6] [7,6]
    val tiles = tileDF(Seq(
      (0.0, 2.0, 2, 2, Seq(1L, 2L, 3L, 4L)),
      (2.0, 2.0, 2, 2, Seq(5L, 6L, 1L, 1L))))
    val h = Raster.bucketHistogram(tiles, 4).orderBy(col("bucket_lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(h == List((1L, 2L, 4L), (3L, 4L, 2L), (5L, 6L, 2L), (7L, 6L, 0L)))
  }

  test("bucketHistogram counts max-valued pixels when range divides buckets exactly") {
    // values 1..5 (range 4, an exact multiple of B=4): a ceil-based step
    // of 1 would compute bucket 4 for value 5 and silently drop it; the
    // floor+1 step (2) keeps every pixel counted
    val tiles = tileDF(Seq((0.0, 2.0, 2, 2, Seq(1L, 2L, 3L, 4L)),
      (2.0, 1.0, 1, 1, Seq(5L))))
    val h = Raster.bucketHistogram(tiles, 4).orderBy(col("bucket_lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(h == List((1L, 2L, 2L), (3L, 4L, 2L), (5L, 5L, 1L), (7L, 5L, 0L)))
    assert(h.map(_._3).sum == 5L) // every pixel lands in a bucket
  }

  test("countValue returns zero (not null) when the SMA prefilter drops all tiles") {
    val tiles = tileDF(Seq((0.0, 2.0, 2, 2, Seq(1L, 2L, 3L, 4L))))
    assert(Raster.countValue(tiles, 99L).head().getLong(0) == 0L)
  }

  test("withValues keeps only tiles containing every listed value") {
    val tiles = tileDF(Seq(
      (0.0, 2.0, 2, 2, Seq(1L, 2L, 3L, 4L)),   // has 1 and 4
      (2.0, 2.0, 2, 2, Seq(5L, 6L, 1L, 1L)),   // has 1, not 4
      (4.0, 2.0, 2, 2, Seq(4L, 4L, 4L, 4L))))  // has 4, not 1
    val kept = Raster.withValues(tiles, 1L, 4L).select("ulx").collect().map(_.getDouble(0))
    assert(kept.toList == List(0.0))
  }

  test("joinRaster combines pixels of co-located tiles only") {
    val a = Raster.rasterize(pts, col("x"), col("y"), 1.0, 2, 2)
    val sum = Raster.joinRaster(a, a, (x, y) => x + y).collect()(0)
    assert(sum.getSeq[Long](sum.fieldIndex("data")) == Seq(2L, 0L, 4L, 2L))
    val far = Raster.rasterize(Seq((10.5, 10.5)).toDF("x", "y"), col("x"), col("y"), 1.0, 2, 2)
    assert(Raster.joinRaster(a, far, (x, y) => x + y).count() == 0)
  }

  // ---- filterGeom: reference-fixture ports (RasterFilterVectorRDDTest) ----

  private def tileDF(ts: Seq[(Double, Double, Int, Int, Seq[Long])]) =
    ts.map { case (x, y, w, h, d) => (x, y, w, h, 1.0, d) }
      .toDF("ulx", "uly", "width", "height", "pixel_width", "data")

  test("st_tile_value replays the reference TileTest position tables") {
    import graft.functions.stf
    def values(tile: org.apache.spark.sql.DataFrame,
               probes: Seq[(Double, Double, java.lang.Long)]): Long = {
      val p = probes.toDF("px", "py", "expect")
      tile.crossJoin(p).select(
          stf.st_tile_value(col("ulx"), col("uly"), col("width"), col("height"),
            col("pixel_width"), col("data"), col("px"), col("py")).as("v"), col("expect"))
        .where(not(col("v") <=> col("expect"))).count()
    }
    // 16x11 identity tile, uly = 11 (value == index; TileTest.scala:14-40,74-82)
    val t16 = tileDF(Seq((0.0, 11.0, 16, 11, Seq.tabulate(176)(_.toLong))))
    assert(values(t16, Seq(
      (0.0, 11.0, 0L), (15.0, 1.0, 175L), // ulx/uly anchor; last cell = w*h-1
      (14.5, 0.5, 174L), (4.5, 6.5, 68L), // "position within" hand table
      (0.5, 10.5, 0L))) == 0)
    // 3x3 matrix tile, uly = 3 (TileTest.scala:66-72); value(0.5,0.5) reads
    // index 6 of (0,0,1,2,1,0,2,1,0)
    val t3 = tileDF(Seq((0.0, 3.0, 3, 3, Seq(0L, 0L, 1L, 2L, 1L, 0L, 2L, 1L, 0L))))
    assert(values(t3, Seq((0.5, 0.5, 2L), (0.0, 3.0, 0L))) == 0)
    // non-zero origin: ulx=10, uly=10, 7x5 identity (TileTest.scala:84-115);
    // the row table walks y from uly down, idxFromPos spot checks
    val t7 = tileDF(Seq((10.0, 10.0, 7, 5, Seq.tabulate(35)(_.toLong))))
    assert(values(t7, Seq(
      (10.2, 10.0, 0L), (10.2, 9.5, 0L), (10.2, 8.5, 7L), (10.2, 7.5, 14L),
      (10.2, 6.4, 21L), (10.2, 5.5, 28L), // row(y) table * width
      (12.5, 7.5, 16L), (16.5, 5.5, 34L), (10.5, 9.5, 0L), // idxFromPos table
      // deliberate fixes vs the reference: x left of ulx abs-wraps there
      // (its own column test passes y values and only works through the
      // abs, Tile.scala:113) — here it is NULL; same for below-bottom and
      // right-of-frame probes instead of an ArrayIndexOutOfBounds crash
      (9.5, 9.5, null), (10.5, 4.9, null), (17.2, 7.5, null))) == 0)
    // SQL-text path resolves and agrees
    t3.createOrReplaceTempView("ttv_tile")
    val sqlV = spark.sql(
      "SELECT st_tile_value(ulx, uly, width, height, pixel_width, data, 0.5, 0.5) FROM ttv_tile")
      .collect()(0).getLong(0)
    assert(sqlV == 2L)
  }

  test("filterGeom: tile-level filter count (reference test 1: 100 tiles -> 64)") {
    // 10x10 grid of 10x10-pixel tiles, query POLYGON((11 11, 89 11, 89 89, 11 89))
    val tiles = tileDF(for { w <- 0 until 10; h <- 0 until 10 }
      yield (w * 10.0, h * 10.0, 10, 10, Seq.fill(100)((w * 10 + h * 10).toLong)))
    val res = Raster.filterGeom(tiles,
      graft.functions.stf.st_geomfromwkt("POLYGON ((11 11, 89 11, 89 89, 11 89, 11 11))"),
      graft.operators.JoinPredicate.Intersects, default = Byte.MinValue.toLong)
    assert(res.count() == 64) // 100 - 36 (reference RasterFilterVectorRDDTest:36-38)
  }

  test("filterGeom: matching pixels for intersecting poly (reference hand-counted 6x5)") {
    val MIN = Int.MinValue.toLong
    val tiles = tileDF(Seq((0.0, 7.0, 11, 7, Seq.tabulate(77)(_.toLong))))
    val res = Raster.filterGeom(tiles,
      graft.functions.stf.st_geomfromwkt("POLYGON ((5 -1, 7.5 3.5, 13 5.5, 13 -1, 5 -1))"),
      graft.operators.JoinPredicate.Intersects, default = MIN).collect()
    assert(res.length == 1)
    val t = res(0)
    assert(t.getAs[Int]("width") == 6 && t.getAs[Int]("height") == 5)
    // reference expects this multiset (RasterFilterVectorRDDTest:107-117);
    // our row-major order pins it exactly
    assert(t.getSeq[Long](t.fieldIndex("data")) == Seq(
      MIN, MIN, 29L, 30L, 31L, 32L,
      MIN, 39L, 40L, 41L, 42L, 43L,
      49L, 50L, 51L, 52L, 53L, 54L,
      60L, 61L, 62L, 63L, 64L, 65L,
      71L, 72L, 73L, 74L, 75L, 76L))
  }

  test("filterGeom: covering polygon passes the tile through unchanged (reference test 5)") {
    val tiles = tileDF(Seq((0.0, 7.0, 11, 7, Seq.tabulate(77)(_.toLong))))
    val res = Raster.filterGeom(tiles,
      graft.functions.stf.st_geomfromwkt("POLYGON ((-1 -1, 100 -1, 100 100, -1 100, -1 -1))"),
      graft.operators.JoinPredicate.Intersects, default = -1L).collect()
    assert(res.length == 1)
    val t = res(0)
    assert(t.getAs[Double]("ulx") == 0.0 && t.getAs[Double]("uly") == 7.0)
    assert(t.getAs[Int]("width") == 11 && t.getAs[Int]("height") == 7)
    assert(t.getSeq[Long](t.fieldIndex("data")) == Seq.tabulate(77)(_.toLong))
  }

  test("filterGeom: off-snap-grid tile frame stays inside the tile (no row shift)") {
    // uly = 10.0006: snap-to-1/1024 ROUNDS UP (10.0006*1024 = 10240.61 ->
    // 10241/1024 > uly); before the clamp this shifted every parent-row
    // lookup up by one and default-filled the top row
    val data = Seq.tabulate(16)(_.toLong)
    val tiles = Seq((0.0006, 10.0006, 4, 4, 0.1, data))
      .toDF("ulx", "uly", "width", "height", "pixel_width", "data")
    val res = Raster.filterGeom(tiles,
      graft.functions.stf.st_geomfromwkt("POLYGON ((-5 -5, 50 -5, 50 50, -5 50, -5 -5))"),
      graft.operators.JoinPredicate.Intersects, default = -1L).collect()
    assert(res.length == 1)
    val t = res(0)
    assert(t.getAs[Int]("width") == 4 && t.getAs[Int]("height") == 4)
    assert(t.getSeq[Long](t.fieldIndex("data")) == data)
  }

  test("filterGeom identity holds for random off-grid anchors and pixel widths") {
    // covering query -> output tile must be an exact copy, whatever the
    // anchor's rounding direction or pixel width (pins the clamp +
    // epsilon-guarded ceil/floor arithmetic on both axes)
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 12) {
      val pw = Seq(0.1, 0.25, 1.0)(trial % 3)
      val w = 2 + rnd.nextInt(5); val h = 2 + rnd.nextInt(5)
      val ulx = rnd.nextDouble() * 20 - 10
      val uly = rnd.nextDouble() * 20
      val data = Seq.tabulate(w * h)(i => (i * 7 + trial).toLong)
      val tiles = Seq((ulx, uly, w, h, pw, data))
        .toDF("ulx", "uly", "width", "height", "pixel_width", "data")
      val res = Raster.filterGeom(tiles,
        graft.functions.stf.st_geomfromwkt("POLYGON ((-99 -99, 99 -99, 99 99, -99 99, -99 -99))"),
        graft.operators.JoinPredicate.Intersects, default = -1L).collect()
      assert(res.length == 1, s"trial $trial: expected one tile")
      val t = res(0)
      assert(t.getAs[Int]("width") == w && t.getAs[Int]("height") == h,
        s"trial $trial (ulx=$ulx uly=$uly pw=$pw): frame ${t.getAs[Int]("width")}x${t.getAs[Int]("height")} != ${w}x$h")
      assert(t.getSeq[Long](t.fieldIndex("data")) == data,
        s"trial $trial (ulx=$ulx uly=$uly pw=$pw): pixel shift")
    }
  }

  test("filterGeom on a pixel-aligned box equals filterClip (randomized differential)") {
    val rnd = new scala.util.Random(11)
    val world = Seq.tabulate(400)(i => ((i % 20) + 0.5, (i / 20) + 0.5)).toDF("x", "y")
    val tiles = Raster.rasterize(world, col("x"), col("y"), 1.0, 4, 4)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("ulx"), col("uly"), col("width"), col("height"),
        concat_ws(",", transform(col("data"), x => x.cast("string"))))
      .collect().map(_.toSeq).toSet
    for (_ <- 1 to 4) {
      val x0 = rnd.nextInt(10).toDouble; val y0 = rnd.nextInt(10).toDouble
      val x1 = x0 + 1 + rnd.nextInt(8); val y1 = y0 + 1 + rnd.nextInt(8)
      val wkt = s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"
      // every frame pixel of an axis-aligned box query intersects the box,
      // so no default fill and the two operators must agree exactly
      val viaGeom = key(Raster.filterGeom(tiles,
        graft.functions.stf.st_geomfromwkt(wkt),
        graft.operators.JoinPredicate.Intersects, default = -99L))
      val viaClip = key(Raster.filterClip(tiles, x0, y0, x1, y1))
      assert(viaGeom == viaClip, s"box ($x0,$y0)-($x1,$y1)")
    }
  }

  test("joinRasterIntersecting equals a brute-force pair computation (randomized)") {
    val rnd = new scala.util.Random(13)
    // random 3x3 tiles at integer anchors with pw=1, values 0..9
    def mk(n: Int, seedShift: Int) = tileDF((0 until n).map { i =>
      (rnd.nextInt(6).toDouble, (rnd.nextInt(6) + 3).toDouble, 3, 3,
       Seq.fill(9)(rnd.nextInt(10).toLong))
    })
    val a = mk(8, 0).dropDuplicates("ulx", "uly").localCheckpoint()
    val b = mk(8, 1).dropDuplicates("ulx", "uly").localCheckpoint()
    val got = Raster.joinRasterIntersecting(a, b, cellSize = 7.0, (x, y) => x * 100 + y)
      .select(col("ulx"), col("uly"), col("width"), col("height"),
        concat_ws(",", transform(col("data"), x => x.cast("string"))))
      .collect().map(_.toSeq).toSet
    // brute force on the driver
    def tiles(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getDouble(0), r.getDouble(1), r.getInt(2), r.getInt(3),
       r.getSeq[Long](5).toArray)
    }
    val exp = (for {
      (ax, ay, aw, ah, ad) <- tiles(a)
      (bx, by, bw, bh, bd) <- tiles(b)
      ix0 = math.max(ax, bx); ix1 = math.min(ax + aw, bx + bw)
      iy1 = math.min(ay, by); iy0 = math.max(ay - ah, by - bh)
      if ix1 > ix0 && iy1 > iy0
    } yield {
      val nw = (ix1 - ix0).toInt; val nh = (iy1 - iy0).toInt
      val data = (0 until nw * nh).map { i =>
        val px = ix0 + i % nw; val py = iy1 - i / nw
        val av = ad(((ay - py).toInt) * aw + (px - ax).toInt)
        val bv = bd(((by - py).toInt) * bw + (px - bx).toInt)
        av * 100 + bv
      }
      Seq[Any](ix0, iy1, nw, nh, data.mkString(","))
    }).toSet
    assert(got == exp && exp.nonEmpty)
  }

  test("joinRasterIntersecting: aligned grids reproduce joinRaster; touching tiles drop") {
    val a = Raster.rasterize(pts, col("x"), col("y"), 1.0, 2, 2)
    val aligned = Raster.joinRasterIntersecting(a, a, cellSize = 4.0, (x, y) => x + y).collect()(0)
    assert(aligned.getAs[Double]("ulx") == 0.0 && aligned.getAs[Double]("uly") == 2.0)
    assert(aligned.getSeq[Long](aligned.fieldIndex("data")) == Seq(2L, 0L, 4L, 2L))
    // a tile sharing only an edge (x in [2,4]) has zero-area intersection
    val touch = Raster.rasterize(Seq((2.5, 0.5)).toDF("x", "y"), col("x"), col("y"), 1.0, 2, 2)
    assert(Raster.joinRasterIntersecting(a, touch, 4.0, (x, y) => x + y).count() == 0)
  }

  test("joinRasterIntersecting: half-pixel-offset grids resample the overlap frame") {
    // left: 2x2 tile at [0,2]x[0,2], values row-major-top [1,0,2,1]
    val a = Raster.rasterize(pts, col("x"), col("y"), 1.0, 2, 2)
    // right: same points shifted so its tile sits at [-1,1]x[-1,1]
    val b = Raster.rasterize(pts.select((col("x") + 1.0).as("x"), (col("y") + 1.0).as("y")),
        col("x"), col("y"), 1.0, 2, 2)
      .withColumn("ulx", col("ulx") - 1.0).withColumn("uly", col("uly") - 1.0)
    // the shifted points land in three b tiles ([-1,1]^2, [1,3]x[-1,1],
    // [-1,1]x[1,3]); each overlaps a's [0,2]^2 tile in exactly one pixel.
    // Hand-computed sums: a bottom-left 2 + b(1.5,1.5)x2 = 4; a bottom-right
    // 1 + b(2.5,1.5) = 2; a top-left 1 + b(1.5,2.5) = 2.
    val out = Raster.joinRasterIntersecting(a, b, 4.0, (x, y) => x + y).collect()
    assert(out.length == 3)
    val byAnchor = out.map(t => (t.getAs[Double]("ulx"), t.getAs[Double]("uly")) ->
      (t.getAs[Int]("width"), t.getAs[Int]("height"),
       t.getSeq[Long](t.fieldIndex("data")).toList)).toMap
    assert(byAnchor((0.0, 1.0)) == ((1, 1, List(4L))))
    assert(byAnchor((1.0, 1.0)) == ((1, 1, List(2L))))
    assert(byAnchor((0.0, 2.0)) == ((1, 1, List(2L))))
  }
}
