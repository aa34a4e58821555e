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

  test("joinRaster combines pixels of co-located tiles only") {
    val a = Raster.rasterize(pts, col("x"), col("y"), 1.0, 2, 2)
    val sum = Raster.joinRaster(a, a, (x, y) => x + y).collect()(0)
    assert(sum.getSeq[Long](sum.fieldIndex("data")) == Seq(2L, 0L, 4L, 2L))
    val far = Raster.rasterize(Seq((10.5, 10.5)).toDF("x", "y"), col("x"), col("y"), 1.0, 2, 2)
    assert(Raster.joinRaster(a, far, (x, y) => x + y).count() == 0)
  }
}
