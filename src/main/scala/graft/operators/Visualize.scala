package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/**
 * Visualization sink — renders a point set to a PNG heat image (reference
 * src/main/java/dbis/stark/visualization/Visualization.java, ~600 LoC of
 * driver-side java2d; SURVEY §2.1 "visualization sink").
 *
 * Distributed design: one aggregation pass bins points into the output
 * pixel grid (`groupBy(px, py).count` — a plain shuffle, identical shape to
 * [[Raster.rasterize]]), then only the pixel *histogram* — never the data —
 * is collected and painted on the driver. Image size bounds driver memory
 * (w·h counts), independent of input cardinality.
 */
object Visualize {

  /** Encode for the reference's `outputType` parameter (Visualization.java
    * :210-220 writes png/jpg via ImageIO). JPEG writers reject or mangle
    * alpha, so ARGB canvases flatten onto opaque black first; an unknown
    * format fails loudly instead of returning an empty byte array. */
  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val flat =
      if (format.equalsIgnoreCase("png") || img.getType != BufferedImage.TYPE_INT_ARGB) img
      else {
        val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = rgb.getGraphics
        g.drawImage(img, 0, 0, null)
        g.dispose()
        rgb
      }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(flat, format, out), s"no image writer for format '$format'")
    out.toByteArray
  }

  /**
   * The distributed half of the sink on its own: per-pixel point counts
   * (`px`, `py`, `cnt`) for points inside [x0,x1)×[y0,y1) on a w×h grid —
   * one groupBy shuffle, output bounded by the pixel count. This is the
   * part that touches data; painting is a driver-side formatting step.
   */
  def bins(df: DataFrame, xCol: Column, yCol: Column,
           x0: Double, y0: Double, x1: Double, y1: Double,
           w: Int, h: Int): DataFrame = {
    val sx = w / (x1 - x0)
    val sy = h / (y1 - y0)
    val px = least(greatest(floor((xCol - x0) * sx).cast("int"), lit(0)), lit(w - 1))
    val py = least(greatest(floor((yCol - y0) * sy).cast("int"), lit(0)), lit(h - 1))
    df.filter(xCol >= x0 && xCol < x1 && yCol >= y0 && yCol < y1)
      .groupBy(px.as("px"), py.as("py")).agg(count(lit(1)).as("cnt"))
  }

  /**
   * Distributed geometry rasterization: per-pixel ink counts (`px`, `py`,
   * `cnt`) for arbitrary geometries (points with `pointSize` dilation,
   * linestring Bresenham, polygon outline or even-odd `fill`) on a w×h
   * canvas over [x0,x1)×[y0,y1) — the line/polygon half of the reference's
   * visualization sink (Visualization.java:222-258), Spark-first: each row
   * expands to the pixels it inks ([[graft.functions.GeoOps.rasterPixels]],
   * a narrow per-row explode bounded by inked area), then the same
   * groupBy-pixel shuffle as [[bins]]. `cnt` = number of geometries inking
   * the pixel (the reference's flat overdraw = `cnt >= 1`). No driver-side
   * drawing, no per-partition image merge — images never cross the wire.
   *
   * For the reference's `worldProj` flag, pre-project with
   * `stf.st_mercator(geo, w, h)` and pass window (0, 0, w, h); the result
   * is then in image coordinates (y down), so paint with `flipY = false`.
   */
  def geomBins(df: DataFrame, geo: Column,
               x0: Double, y0: Double, x1: Double, y1: Double,
               w: Int, h: Int, fill: Boolean = false, pointSize: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(explode(graft.functions.stf.st_raster_pixels(geo,
        lit(x0), lit(y0), lit(x1), lit(y1), lit(w), lit(h), lit(fill), lit(pointSize)))
        .as("__pix"))
      .select(shiftright(col("__pix"), 32).cast("int").as("px"),
        col("__pix").bitwiseAND(lit(0xffffffffL)).cast("int").as("py"))
      .groupBy(col("px"), col("py")).agg(count(lit(1)).as("cnt"))
  }

  /**
   * Render geometries to an ARGB PNG: solid `color` per inked pixel (the
   * reference's flat overdraw, Visualization.java:27,90), optionally over a
   * `background` image (the reference's bgImagePath compositing, :113-124).
   * `flipY = true` treats world y as up (pass false for pre-projected
   * image-space geometry such as `st_mercator` output).
   */
  def renderGeomPng(df: DataFrame, geo: Column,
                    x0: Double, y0: Double, x1: Double, y1: Double,
                    w: Int, h: Int, fill: Boolean = false, pointSize: Int = 1,
                    color: Int = 0xFFFF0000, background: BufferedImage = null,
                    flipY: Boolean = true, format: String = "png"): Array[Byte] = {
    val inked = geomBins(df, geo, x0, y0, x1, y1, w, h, fill, pointSize).collect()
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    if (background != null) {
      val g = img.getGraphics
      g.drawImage(background, 0, 0, null)
      g.dispose()
    }
    inked.foreach { r =>
      val ix = r.getInt(0)
      val iy = if (flipY) h - 1 - r.getInt(1) else r.getInt(1)
      img.setRGB(ix, iy, color)
    }
    encode(img, format)
  }

  /**
   * Distributed half of the reference's RASTER visualization
   * (Visualization.java drawRaster/drawRasterInt, :129-208): each tile
   * data pixel lands on the canvas at its WORLD position (tile ulx/uly +
   * pixel_width; pixel centers, [[Raster]] grid contract), canvas pixels
   * aggregate `max(value)` over covering data pixels (deterministic under
   * tile overlap). Deliberate fix, not copied: the reference draws every
   * tile at its LOCAL (x, y) image coordinates, so all tiles overdraw the
   * canvas origin — tile position is plainly intended to matter.
   * One narrow posexplode + the same groupBy-pixel shuffle as [[bins]].
   */
  def rasterBins(tiles: DataFrame, x0: Double, y0: Double, x1: Double, y1: Double,
                 w: Int, h: Int): DataFrame = {
    val sx = w / (x1 - x0)
    val sy = h / (y1 - y0)
    val t = tiles.select(col("ulx"), col("uly"), col("width"), col("pixel_width"),
      posexplode(col("data")).as(Seq("__i", "__v")))
    val c = pmod(col("__i"), col("width"))
    val r = floor(col("__i") / col("width"))
    val wx = col("ulx") + (c + 0.5) * col("pixel_width")
    val wy = col("uly") - (r + 0.5) * col("pixel_width")
    t.filter(wx >= x0 && wx < x1 && wy >= y0 && wy < y1)
      .select(
        least(greatest(floor((wx - x0) * sx).cast("int"), lit(0)), lit(w - 1)).as("px"),
        least(greatest(floor((wy - y0) * sy).cast("int"), lit(0)), lit(h - 1)).as("py"),
        col("__v").as("v"))
      .groupBy(col("px"), col("py")).agg(max(col("v")).as("v"))
  }

  /**
   * Render tiles to a grayscale PNG: intensity = value linearly normalized
   * to the canvas max (the reference's fixed 255-color palette is an
   * arbitrary aesthetic table; the mechanism — value-colored raster canvas
   * — is what carries over). Same world/canvas mapping as [[rasterBins]].
   */
  def renderRasterPng(tiles: DataFrame, x0: Double, y0: Double, x1: Double, y1: Double,
                      w: Int, h: Int, format: String = "png"): Array[Byte] = {
    val binsArr = rasterBins(tiles, x0, y0, x1, y1, w, h).collect()
    // anchor the scale at min(0, data min): non-negative rasters keep the
    // 0-anchored scale unchanged, and a negative value darkens instead of
    // wrapping through setSample's & 0xFF (a -5 would render near-white)
    val minV = if (binsArr.isEmpty) 0.0 else math.min(binsArr.map(_.getLong(2)).min.toDouble, 0.0)
    val maxV = if (binsArr.isEmpty) 1.0
               else math.max(binsArr.map(_.getLong(2)).max.toDouble, minV + 1.0)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    binsArr.foreach { r =>
      val v = (255.0 * (r.getLong(2) - minV) / (maxV - minV)).toInt
      img.getRaster.setSample(r.getInt(0), h - 1 - r.getInt(1), 0, v)
    }
    encode(img, format)
  }

  /**
   * Render points to a grayscale PNG: intensity = log-scaled point count
   * per pixel. World rectangle [x0,x1)×[y0,y1) maps to w×h pixels, y up.
   */
  def renderPng(df: DataFrame, xCol: Column, yCol: Column,
                x0: Double, y0: Double, x1: Double, y1: Double,
                w: Int, h: Int, format: String = "png"): Array[Byte] = {
    val bins = Visualize.bins(df, xCol, yCol, x0, y0, x1, y1, w, h).collect()

    val maxC = if (bins.isEmpty) 1.0 else bins.map(_.getLong(2)).max.toDouble
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    bins.foreach { r =>
      val ix = r.getInt(0)
      val iy = h - 1 - r.getInt(1) // image origin is top-left; world y is up
      val v = (255.0 * math.log1p(r.getLong(2)) / math.log1p(maxC)).toInt
      img.getRaster.setSample(ix, iy, 0, v)
    }
    encode(img, format)
  }
}
