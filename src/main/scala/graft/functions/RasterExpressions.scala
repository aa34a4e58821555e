package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, codegen}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Envelope
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/**
 * Raster-filter kernel: clip one tile against an arbitrary vector geometry
 * with default fill — the reference's `RasterUtils.getPixels`
 * (reference src/main/scala/dbis/stark/raster/RasterUtils.scala:128-205,
 * driven by RasterFilterVectorRDD.scala:10-53):
 *
 *  - the output frame is the MBR of (tile bounds ∩ query geometry) at the
 *    tile's pixel width, anchored at the MBR's upper-left (NOT pixel-aligned
 *    in general);
 *  - each output pixel is a pw×pw rectangle from the frame's upper-left; it
 *    keeps the parent tile's value at its upper-left position when the
 *    rectangle intersects (or, for containment mode, is contained in) the
 *    query geometry, and the default value otherwise.
 *
 * Two deliberate deviations from the reference, cited in SURVEY §2.2 #22:
 * frame pixel counts are `ceil(extent / pw)` (the reference's two
 * `mbrToTile` overloads disagree for pw ≠ 1 — RasterUtils.scala:225-243);
 * and out-of-range parent lookups produce the default value instead of an
 * executor crash. Rounding noise is absorbed by the same 1e-9-guarded
 * ceil/floor arithmetic as `Raster.joinRasterIntersecting` (a guarded ceil
 * cannot flip up from one-ulp noise, a guarded floor cannot flip down),
 * and the frame is clamped into the tile bounds so a noisy intersection
 * envelope can never shift the parent-pixel lookup out of frame.
 */
object RasterOps {
  private val gf = new org.locationtech.jts.geom.GeometryFactory()

  /** Per-thread identity cache: the query geometry is a literal in the hot
    * path, so prepare (index) it once per task, not once per tile. */
  private final class PrepCache {
    var k1: Array[Byte] = _; var v1: PreparedGeometry = _
    def get(k: Array[Byte]): PreparedGeometry = {
      if (k eq k1) return v1
      val g = PreparedGeometryFactory.prepare(GeoOps.readGeom(k))
      k1 = k; v1 = g
      g
    }
  }
  private val prepCache = ThreadLocal.withInitial[PrepCache](() => new PrepCache)

  private final val Eps = 1e-9

  /** Null when the tile does not overlap the query at all (zero-area touch
    * included — a frame with no pixels carries no information). */
  def clipTile(ulx: Double, uly: Double, width: Int, height: Int, pw: Double,
               data: ArrayData, qry: InternalRow, isIntersects: Boolean,
               default: Long): InternalRow = {
    val qryWkb = qry.getBinary(0)
    val qryGeom = GeoOps.readGeom(qryWkb)
    val tileGeom = gf.toGeometry(new Envelope(ulx, ulx + width * pw, uly - height * pw, uly))
    val inter = tileGeom.intersection(qryGeom)
    if (inter.isEmpty) return null
    val env = inter.getEnvelopeInternal
    // clamp into the tile frame: overlay noise on the intersection envelope
    // (which lies within the tile by construction) must not push a bound
    // outside the tile — that would shift every parent lookup by one and
    // default-fill an edge row/column
    val minX = math.max(env.getMinX, ulx)
    val maxX = math.min(env.getMaxX, ulx + width * pw)
    val minY = math.max(env.getMinY, uly - height * pw)
    val maxY = math.min(env.getMaxY, uly)
    val ow = math.ceil((maxX - minX) / pw - Eps).toInt
    val oh = math.ceil((maxY - minY) / pw - Eps).toInt
    if (ow <= 0 || oh <= 0) return null
    val prep = prepCache.get().get(qryWkb)
    val out = new Array[Long](ow * oh)
    var j = 0
    while (j < oh) {
      val posY = maxY - j * pw
      val row = math.floor((uly - posY) / pw + Eps).toInt
      var i = 0
      while (i < ow) {
        val posX = minX + i * pw
        val pix = gf.toGeometry(new Envelope(posX, posX + pw, posY - pw, posY))
        val matched = if (isIntersects) prep.intersects(pix) else prep.contains(pix)
        val c = math.floor((posX - ulx) / pw + Eps).toInt
        out(j * ow + i) =
          if (matched && row >= 0 && row < height && c >= 0 && c < width)
            data.getLong(row * width + c)
          else default
        i += 1
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](minX, maxY, ow, oh, pw, new GenericArrayData(out)))
  }

  /** Value at world position (x, y): the reference's `Tile.value`/
    * `idxFromPos`/`row`/`column` accessors (reference
    * src/main/scala/dbis/stark/raster/Tile.scala:110-119) with two deliberate
    * fixes. The row/column arithmetic scales by pixel width — the reference's
    * `column(x) = |x - ulx|.toInt` ignores it, so it is correct only for
    * pw = 1 — and out-of-frame positions return NULL instead of the
    * reference's abs-wraparound (a position left of ulx silently reads a
    * mirrored column) or an ArrayIndexOutOfBounds executor crash. For pw = 1
    * and in-frame positions truncation and floor agree, so the reference's
    * hand-computed tables (TileTest.scala:30-115) replay verbatim. The same
    * 1e-9 floor guard as [[clipTile]] absorbs one-ulp noise from positions
    * computed as `ulx + k * pw`. */
  def tileValue(ulx: Double, uly: Double, width: Int, height: Int, pw: Double,
                data: ArrayData, x: Double, y: Double): java.lang.Long = {
    val c = math.floor((x - ulx) / pw + Eps).toInt
    val r = math.floor((uly - y) / pw + Eps).toInt
    if (c < 0 || c >= width || r < 0 || r >= height) null
    else java.lang.Long.valueOf(data.getLong(r * width + c))
  }
}

/** st_clip_tile(ulx, uly, width, height, pixel_width, data, qry,
  * is_intersects, default) → clipped tile struct, or NULL when the tile
  * misses the query geometry. Per-tile (not per-pixel) eval: the JTS work
  * happens once per row against a prepared query geometry. */
case class STClipTile(children: Seq[Expression])
    extends Expression with codegen.CodegenFallback {
  require(children.size == 9, "st_clip_tile takes 9 arguments")
  override def dataType: DataType = StructType(Seq(
    StructField("ulx", DoubleType, nullable = false),
    StructField("uly", DoubleType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixel_width", DoubleType, nullable = false),
    StructField("data", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else RasterOps.clipTile(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Double],
      vs(5).asInstanceOf[ArrayData], SpatialExpressions.row(vs(6)),
      vs(7).asInstanceOf[Boolean], vs(8).asInstanceOf[Long])
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): STClipTile =
    copy(children = cs)
  override def prettyName: String = "st_clip_tile"
}

/** st_tile_value(ulx, uly, width, height, pixel_width, data, x, y) → the
  * pixel value at world position (x, y), or NULL when the position falls
  * outside the tile frame (see [[RasterOps.tileValue]] for the contract). */
case class STTileValue(children: Seq[Expression])
    extends Expression with codegen.CodegenFallback {
  require(children.size == 8, "st_tile_value takes 8 arguments")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else RasterOps.tileValue(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Double],
      vs(5).asInstanceOf[ArrayData],
      vs(6).asInstanceOf[Double], vs(7).asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): STTileValue =
    copy(children = cs)
  override def prettyName: String = "st_tile_value"
}
