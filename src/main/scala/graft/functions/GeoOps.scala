package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry, GeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/**
 * Runtime kernel for the spatio-temporal column type `stobj`.
 *
 * `stobj` is an open struct `(geom BINARY[WKB], t_start LONG NULL, t_end LONG NULL)`
 * so Catalyst can prune and data-skip on the temporal longs and the geometry
 * stays a single compact WKB column (see SURVEY.md §1.3; contrast with the
 * reference's opaque byte-array UDT, reference
 * src/main/scala/org/apache/spark/sql/spatial/STObjectUDT.scala:26-30, which
 * blocks all pushdown).
 *
 * Temporal encoding (reference semantics, src/main/scala/dbis/stark/Instant.scala
 * and Interval.scala):
 *   - no time:              t_start NULL, t_end NULL
 *   - Instant(v):           t_start = v, t_end = v
 *   - Interval(s, Some(e)): t_start = s, t_end = e
 *   - Interval(s, None):    t_start = s, t_end NULL   (right-open)
 * Time is "present" iff t_start is non-null. An Instant is a degenerate
 * closed interval — provably equivalent under intersects/contains/containedBy.
 *
 * All methods here are static so generated (Janino) code can call them via
 * `graft.functions.GeoOps.xxx(...)` inside whole-stage codegen.
 */
object GeoOps {

  val stobjType: StructType = StructType(Seq(
    StructField("geom", BinaryType, nullable = false),
    StructField("t_start", LongType, nullable = true),
    StructField("t_end", LongType, nullable = true)))

  // Predicate op codes (shared by expressions and codegen call sites).
  final val INTERSECTS  = 0
  final val CONTAINS    = 1
  final val CONTAINEDBY = 2
  final val COVERS      = 3
  final val COVEREDBY   = 4

  private val gf = new GeometryFactory()

  // JTS readers/writers are not thread-safe; executors run many tasks per JVM.
  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(gf))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())
  // 3-dim variant used ONLY by z-carrying constructors (a global 3-dim
  // writer would pad every 2-D geometry with z=NaN and bloat every stream)
  private val wkbWriter3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(gf))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())

  /**
   * Per-thread 2-slot identity cache for WKB→Geometry. Filter-against-literal
   * is the hot path: the literal's byte array is the *same object* every row,
   * so reference equality avoids re-parsing the query geometry per row.
   * The second slot helps join probes where one side repeats within a batch.
   */
  private final class GeomCache {
    var k1: Array[Byte] = _; var v1: Geometry = _
    var k2: Array[Byte] = _; var v2: Geometry = _
    def get(k: Array[Byte]): Geometry = {
      if (k eq k1) return v1
      if (k eq k2) return v2
      val g = wkbReader.get().read(k)
      k2 = k1; v2 = v1; k1 = k; v1 = g
      g
    }
  }
  private val geomCache = ThreadLocal.withInitial[GeomCache](() => new GeomCache)

  def readGeom(wkb: Array[Byte]): Geometry = geomCache.get().get(wkb)
  def writeGeom(g: Geometry): Array[Byte] = wkbWriter.get().write(g)

  /** Write preserving the input's dimensionality: a geometry whose first
    * coordinate carries z re-encodes through the 3-dim writer (anything
    * else keeps the compact 2-D stream). Transforms that rebuild WKB
    * (e.g. [[mercator]]) must use this, or a z set by `st_point(x,y,z)`
    * silently vanishes on the way through. */
  def writeGeomKeepZ(g: Geometry): Array[Byte] = {
    val c = g.getCoordinate
    if (c != null && !java.lang.Double.isNaN(c.getZ)) wkbWriter3.get().write(g)
    else wkbWriter.get().write(g)
  }
  def parseWkt(wkt: String): Geometry = wktReader.get().read(wkt)
  def toWkt(g: Geometry): String = wktWriter.get().write(g)

  // writeGeomKeepZ: a z parsed from 3-D WKT ('POINT Z (1 2 3)') must
  // survive the same way st_point(x,y,z)'s does; 2-D producers (NaN z)
  // keep the compact writer unchanged
  def mkRow(g: Geometry, tStart: java.lang.Long, tEnd: java.lang.Long): InternalRow =
    new GenericInternalRow(Array[Any](writeGeomKeepZ(g), tStart, tEnd))

  // ---- constructors (codegen entry points) ----

  def fromWkt(wkt: UTF8String): InternalRow =
    mkRow(parseWkt(wkt.toString), null, null)

  def mkPoint(x: Double, y: Double): InternalRow =
    mkRow(gf.createPoint(new Coordinate(x, y)), null, null)

  /** 3-D point (reference STObject.scala:245-248 `STObject(x, y, z)`): z is
    * CARRIED through WKB (3-dim writer below), accessible via st_z, but —
    * exactly like the reference, whose JTS-backed predicates read XY only —
    * never participates in spatial predicates or distances. Only this
    * constructor pays the 3-dim WKB encoding; 2-D geometries keep the
    * compact 2-D writer, so existing byte streams are unchanged. */
  def mkPointZ(x: Double, y: Double, z: Double): InternalRow =
    new GenericInternalRow(Array[Any](
      wkbWriter3.get().write(gf.createPoint(new Coordinate(x, y, z))), null, null))

  /** Z of the first coordinate; NaN (absent z, or an empty geometry whose
    * getCoordinate is null) maps to SQL NULL in STZ. */
  def stZ(a: InternalRow): Double = {
    val c = readGeom(a.getBinary(0)).getCoordinate
    if (c == null) Double.NaN else c.getZ
  }

  def pointWkb(x: Double, y: Double): Array[Byte] =
    writeGeom(gf.createPoint(new Coordinate(x, y)))

  /** Axis-aligned box polygon. */
  def mkBox(minx: Double, miny: Double, maxx: Double, maxy: Double): InternalRow =
    mkRow(gf.toGeometry(new Envelope(minx, maxx, miny, maxy)), null, null)

  /** Attach/replace the temporal component of an stobj (instant if e == s).
    * Rejects s > e like the reference's `Interval` constructor
    * (reference src/main/scala/dbis/stark/Interval.scala `require`) — an
    * inverted interval breaks predicate reflexivity downstream. */
  def withTime(sto: InternalRow, s: Long, e: Long): InternalRow = {
    if (e < s) throw new IllegalArgumentException(
      s"st_with_time: interval start ($s) must be <= end ($e)")
    new GenericInternalRow(Array[Any](sto.getBinary(0), Long.box(s), Long.box(e)))
  }

  def withInstant(sto: InternalRow, v: Long): InternalRow = withTime(sto, v, v)

  /** Right-open interval: end unknown/unbounded. */
  def withOpenInterval(sto: InternalRow, s: Long): InternalRow =
    new GenericInternalRow(Array[Any](sto.getBinary(0), Long.box(s), null))

  // ---- temporal algebra (reference Interval.scala:32-44, Instant.scala:19-23) ----
  // Encoded on (s, eDefined, e); caller guarantees time is present on both.

  private def tIntersects(s1: Long, e1d: Boolean, e1: Long,
                          s2: Long, e2d: Boolean, e2: Long): Boolean =
    (s1 <= s2 && (!e1d || e1 >= s2)) || (s2 <= s1 && (!e2d || e2 >= s1))

  /** Does interval 1 contain interval 2 (containee end must be defined). */
  private def tContains(s1: Long, e1d: Boolean, e1: Long,
                        s2: Long, e2d: Boolean, e2: Long): Boolean =
    e2d && s2 >= s1 && (!e1d || e2 <= e1)

  // ---- the full spatio-temporal predicate ----
  // True iff spatial holds AND (both times absent OR both present and the
  // temporal relation holds). Mixed presence => false.
  // (reference src/main/scala/dbis/stark/STObject.scala:18-21,35-89)

  def relate(a: InternalRow, b: InternalRow, op: Int): Boolean = {
    val t1p = !a.isNullAt(1)
    val t2p = !b.isNullAt(1)
    // temporal gate first: cheap longs before any WKB parse
    if (t1p != t2p) return false
    if (t1p) {
      val s1 = a.getLong(1); val e1d = !a.isNullAt(2); val e1 = if (e1d) a.getLong(2) else 0L
      val s2 = b.getLong(1); val e2d = !b.isNullAt(2); val e2 = if (e2d) b.getLong(2) else 0L
      val tOk = op match {
        case INTERSECTS            => tIntersects(s1, e1d, e1, s2, e2d, e2)
        case CONTAINS | COVERS     => tContains(s1, e1d, e1, s2, e2d, e2)
        case CONTAINEDBY | COVEREDBY => tContains(s2, e2d, e2, s1, e1d, e1)
        case _ => false
      }
      if (!tOk) return false
    }
    val ga = readGeom(a.getBinary(0))
    val gb = readGeom(b.getBinary(0))
    op match {
      case INTERSECTS  => ga.intersects(gb)
      case CONTAINS    => ga.contains(gb)
      case CONTAINEDBY => gb.contains(ga)
      case COVERS      => ga.covers(gb)
      case COVEREDBY   => ga.coveredBy(gb)
      case _ => false
    }
  }

  // ---- distances ----

  /** Minimum distance between the two geometries (JTS). */
  def distance(a: InternalRow, b: InternalRow): Double =
    readGeom(a.getBinary(0)).distance(readGeom(b.getBinary(0)))

  /**
   * Euclidean distance between centroids — the reference's default distance
   * function (reference src/main/scala/dbis/stark/Distance.scala:118-128).
   * Written as sqrt(dx*dx + dy*dy) so results are bit-identical to the same
   * formula evaluated by an external SQL oracle.
   */
  def centroidDistance(a: InternalRow, b: InternalRow): Double = {
    val ca = readGeom(a.getBinary(0)).getCentroid
    val cb = readGeom(b.getBinary(0)).getCentroid
    val dx = ca.getX - cb.getX
    val dy = ca.getY - cb.getY
    math.sqrt(dx * dx + dy * dy)
  }

  def withinDistance(a: InternalRow, b: InternalRow, d: Double): Boolean = {
    // envelope prefilter: cheap reject before exact distance
    val ga = readGeom(a.getBinary(0)); val gb = readGeom(b.getBinary(0))
    val ea = ga.getEnvelopeInternal; val eb = gb.getEnvelopeInternal
    if (ea.distance(eb) > d) false else ga.distance(gb) <= d
  }

  // ---- accessors ----

  def stX(a: InternalRow): Double = readGeom(a.getBinary(0)).getCentroid.getX
  def stY(a: InternalRow): Double = readGeom(a.getBinary(0)).getCentroid.getY
  def area(a: InternalRow): Double = readGeom(a.getBinary(0)).getArea
  def asWkt(a: InternalRow): UTF8String = UTF8String.fromString(toWkt(readGeom(a.getBinary(0))))
  def minX(a: InternalRow): Double = readGeom(a.getBinary(0)).getEnvelopeInternal.getMinX
  def maxX(a: InternalRow): Double = readGeom(a.getBinary(0)).getEnvelopeInternal.getMaxX
  def minY(a: InternalRow): Double = readGeom(a.getBinary(0)).getEnvelopeInternal.getMinY
  def maxY(a: InternalRow): Double = readGeom(a.getBinary(0)).getEnvelopeInternal.getMaxY

  // ---- grid cells (spatial partitioning / cell-replicate join) ----

  /** Pack two 32-bit cell indices into one long id. */
  @inline private[graft] def pack(ix: Int, iy: Int): Long = (ix.toLong << 32) | (iy.toLong & 0xffffffffL)

  /** Grid cell of the centroid — the partitioning key. */
  def cellId(a: InternalRow, cellSize: Double): Long = {
    val c = readGeom(a.getBinary(0)).getCentroid
    pack(math.floor(c.getX / cellSize).toInt, math.floor(c.getY / cellSize).toInt)
  }

  /** All grid cells intersecting the geometry's envelope (join replication). */
  def cells(a: InternalRow, cellSize: Double): Array[Long] = {
    val env = readGeom(a.getBinary(0)).getEnvelopeInternal
    cellsOfEnvelope(env, cellSize)
  }

  /** Envelope expanded by `radius` — for within-distance joins. */
  def cellsExpanded(a: InternalRow, cellSize: Double, radius: Double): Array[Long] = {
    val env = new Envelope(readGeom(a.getBinary(0)).getEnvelopeInternal)
    env.expandBy(radius)
    cellsOfEnvelope(env, cellSize)
  }

  private[graft] def cellsOfEnvelope(env: Envelope, cellSize: Double): Array[Long] = {
    val x0 = math.floor(env.getMinX / cellSize).toInt
    val x1 = math.floor(env.getMaxX / cellSize).toInt
    val y0 = math.floor(env.getMinY / cellSize).toInt
    val y1 = math.floor(env.getMaxY / cellSize).toInt
    val count = (x1 - x0 + 1).toLong * (y1 - y0 + 1).toLong
    // a runaway envelope/cellSize ratio must fail loudly, not overflow Int
    require(count <= (1L << 26),
      s"st_cells: envelope spans $count cells at cellSize=$cellSize — " +
      "increase the cell size (spark.graft.join.cellSize) for this data extent")
    val out = new Array[Long](count.toInt)
    var i = 0
    var ix = x0
    while (ix <= x1) {
      var iy = y0
      while (iy <= y1) { out(i) = pack(ix, iy); i += 1; iy += 1 }
      ix += 1
    }
    out
  }

  /**
   * Duplicate-elimination for the cell-replicate join: a candidate pair is
   * reported only from the cell containing the *reference point* = the
   * lower-left corner of the intersection of the two envelopes. Every
   * intersecting pair has exactly one such cell, so no post-join
   * `dropDuplicates` shuffle is needed (standard spatial-join recipe; the
   * reference instead ends zipJoin with a full distinct(), reference
   * src/main/scala/org/apache/spark/PlainSpatialRDDFunctions.scala:325-348).
   */
  def refPointInCell(a: InternalRow, b: InternalRow, cellSize: Double, cell: Long): Boolean = {
    val ea = readGeom(a.getBinary(0)).getEnvelopeInternal
    val eb = readGeom(b.getBinary(0)).getEnvelopeInternal
    val rx = math.max(ea.getMinX, eb.getMinX)
    val ry = math.max(ea.getMinY, eb.getMinY)
    pack(math.floor(rx / cellSize).toInt, math.floor(ry / cellSize).toInt) == cell
  }

  /** Same dedup trick for distance joins (envelopes expanded by radius on the left). */
  def refPointInCellDist(a: InternalRow, b: InternalRow, radius: Double,
                         cellSize: Double, cell: Long): Boolean = {
    val ea = new Envelope(readGeom(a.getBinary(0)).getEnvelopeInternal)
    ea.expandBy(radius)
    val eb = readGeom(b.getBinary(0)).getEnvelopeInternal
    val rx = math.max(ea.getMinX, eb.getMinX)
    val ry = math.max(ea.getMinY, eb.getMinY)
    pack(math.floor(rx / cellSize).toInt, math.floor(ry / cellSize).toInt) == cell
  }

  // ---- temporal accessors ----
  // (null handling done by the expressions; these assume presence)
  def tStart(a: InternalRow): Long = a.getLong(1)
  def tEnd(a: InternalRow): Long = a.getLong(2)

  // ---- additional distance functions (reference Distance.scala:127-168) ----

  /**
   * Directed Hausdorff distance over geometry vertices — max over left
   * vertices of the min distance to a right vertex (exactly the reference's
   * `shausdorff`, Distance.scala:139-154, which iterates boundary points;
   * vertex sets coincide for polygons and extend it to points/lines whose
   * JTS boundary is empty). NOT symmetric.
   */
  def hausdorffDistance(a: InternalRow, b: InternalRow): Double = {
    val lc = readGeom(a.getBinary(0)).getCoordinates
    val rc = readGeom(b.getBinary(0)).getCoordinates
    // no vertices -> no defined distance; returning 0/MaxValue garbage
    // would silently poison any ordering built on this
    if (lc.isEmpty || rc.isEmpty) throw new IllegalArgumentException(
      "st_hausdorff: undefined for empty geometries")
    var worst = 0.0
    var i = 0
    while (i < lc.length) {
      var best = Double.MaxValue
      var j = 0
      while (j < rc.length) {
        val d = lc(i).distance(rc(j))
        if (d < best) best = d
        j += 1
      }
      if (best > worst) worst = best
      i += 1
    }
    worst
  }

  /**
   * Maximum distance between two geometries — max over vertex pairs. The
   * distance to a fixed point is convex, so its maximum over a compact set
   * is attained at an extreme point (a convex-hull vertex, always a member
   * of the coordinate array); maximising over both sides' vertices is
   * therefore exact. Paired with the JTS minimum distance this realises the
   * reference's `IntervalDistance(min,max)` between extended objects
   * (reference src/main/scala/dbis/stark/Distance.scala:27-80).
   */
  def maxDistance(a: InternalRow, b: InternalRow): Double = {
    val lc = readGeom(a.getBinary(0)).getCoordinates
    val rc = readGeom(b.getBinary(0)).getCoordinates
    if (lc.isEmpty || rc.isEmpty) throw new IllegalArgumentException(
      "st_max_distance: undefined for empty geometries")
    var worst = 0.0
    var i = 0
    while (i < lc.length) {
      var j = 0
      while (j < rc.length) {
        val d = lc(i).distance(rc(j))
        if (d > worst) worst = d
        j += 1
      }
      i += 1
    }
    worst
  }

  // ---- visualization rasterization ----
  // (reference src/main/java/dbis/stark/visualization/Visualization.java:222-296
  // draws per-partition java2d images and merges them by overdraw; here the
  // geometry → inked-pixel-set step is a pure kernel so the DISTRIBUTED part
  // stays a bins aggregation — see graft.operators.Visualize.geomBins)

  /**
   * Pixels inked by a geometry on a w×h canvas over world window
   * [x0,x1)×[y0,y1), as packed (px << 32 | py) longs, sorted, deduped,
   * clipped to the canvas (pixels the reference lets java2d clip are
   * dropped here). Pixel space: px = (x - x0)·w/(x1-x0), y up (callers
   * flip at paint time, like [[graft.operators.Visualize.renderPng]]).
   *
   * Drawing rules (documented so an external oracle can reproduce them):
   *  - Point: vertex pixel (floor(px), floor(py)), dilated to a
   *    pointSize×pointSize square growing right/up (reference
   *    Visualization.java:256-258 fillRect semantics).
   *  - LineString: Bresenham between consecutive vertex pixels.
   *  - Polygon, fill=false: Bresenham along every ring (exterior + holes).
   *  - Polygon, fill=true: a pixel is inked iff its center (px+0.5, py+0.5)
   *    is inside the polygon by the even-odd rule in continuous pixel
   *    space — interior only, like java2d fillPolygon (reference :232).
   *  - Multi-geometries / GeometryCollection: each member, union.
   * Unlike the reference (Visualization.java:286 returns null → vertex
   * silently DROPPED from the awt polygon, deforming shapes that cross the
   * viewport edge), vertices outside the window still steer rasterization
   * and only out-of-canvas pixels are clipped — deliberate fix, not copied.
   * (Far-outlier vertices — walks past ~2(w+h) pixel steps — take a
   * Liang-Barsky geometric clip to the canvas first, so one bad coordinate
   * can neither abort the render nor walk millions of dead steps; on-canvas
   * ink then differs only by clip-endpoint rounding at the border.)
   */
  def rasterPixels(a: InternalRow, x0: Double, y0: Double, x1: Double, y1: Double,
                   w: Int, h: Int, fill: Boolean, pointSize: Int): Array[Long] = {
    require(w > 0 && h > 0, s"st_raster_pixels: canvas must be positive, got ${w}x$h")
    // 2^23 admits the reference's own 4096x2048 world-map test
    // (VisualizationTest.scala:40-49); worst case one row inking the whole
    // canvas materializes 64 MB of packed longs — acceptable per-task,
    // beyond it render as tiles
    require(w.toLong * h <= (1L << 23),
      s"st_raster_pixels: canvas ${w}x$h exceeds 2^23 pixels — the per-row pixel " +
      "array is materialized; render larger canvases as tiles")
    require(pointSize >= 1, s"st_raster_pixels: pointSize must be >= 1, got $pointSize")
    val sx = w / (x1 - x0); val sy = h / (y1 - y0)
    // primitive dedup: a thread-resident w*h bitmap (<= 1 MB under the canvas
    // cap, reused across rows) + an append buffer of packed pixels. Peak
    // per-row memory is ~8 bytes per inked pixel — a boxed HashSet was ~6x
    // the 64 MB the canvas-cap comment budgets for a canvas-filling row
    val out = inkBufs.get()
    out.open(w * h)
    def ink(x: Int, y: Int): Unit =
      if (x >= 0 && x < w && y >= 0 && y < h) out.add(y * w + x, pack(x, y))
    def bresenham(ax0: Int, ay0: Int, bx0: Int, by0: Int): Unit = {
      // a segment fully off-canvas inks nothing — skip before walking it
      if (math.max(ax0, bx0) < 0 || math.min(ax0, bx0) >= w ||
          math.max(ay0, by0) < 0 || math.min(ay0, by0) >= h) return
      var ax = ax0; var ay = ay0; var bx = bx0; var by = by0
      // a far-outlier vertex (one bad GPS point) must not abort the whole
      // render NOR walk millions of off-canvas steps: beyond a cheap
      // threshold, Liang-Barsky-clip the continuous segment to the canvas
      // and walk between the rounded clip points. The clip points lie on
      // the same continuous line, so on-canvas ink differs from the
      // unclipped walk by at most endpoint rounding (<= 1 pixel at the
      // border); below the threshold the walk is bit-identical to always.
      if (math.abs(bx0.toLong - ax0) + math.abs(by0.toLong - ay0) > 2L * (w + h)) {
        // Long subtraction first: endpoints straddling > 2^31 pixels (a
        // zoomed viewport plus a bad coordinate) would wrap Int math and
        // flip the direction vector
        val dx = (bx0.toLong - ax0).toDouble; val dy = (by0.toLong - ay0).toDouble
        var t0 = 0.0; var t1 = 1.0
        def clip(p: Double, q: Double): Boolean =
          if (p == 0.0) q >= 0.0
          else {
            val r = q / p
            if (p < 0) { if (r > t1) false else { if (r > t0) t0 = r; true } }
            else       { if (r < t0) false else { if (r < t1) t1 = r; true } }
          }
        val visible =
          clip(-dx, ax0.toDouble) && clip(dx, (w - 1).toDouble - ax0) &&
          clip(-dy, ay0.toDouble) && clip(dy, (h - 1).toDouble - ay0)
        if (!visible) return // the line misses the canvas entirely
        ax = math.round(ax0 + t0 * dx).toInt; ay = math.round(ay0 + t0 * dy).toInt
        bx = math.round(ax0 + t1 * dx).toInt; by = math.round(ay0 + t1 * dy).toInt
      }
      // invariant, not a reachable limit: unclipped walks are <= 2(w+h)
      // steps (w+h <= 2^23+1 under the canvas cap), clipped ones <= w+h
      require(math.abs(bx.toLong - ax) + math.abs(by.toLong - ay) <= (1L << 25),
        s"st_raster_pixels: segment ($ax,$ay)-($bx,$by) walks > 2^25 pixel steps")
      val dx = math.abs(bx - ax); val dy = -math.abs(by - ay)
      val stepx = if (ax < bx) 1 else -1; val stepy = if (ay < by) 1 else -1
      var err = dx + dy; var x = ax; var y = ay
      var more = true
      while (more) {
        ink(x, y)
        if (x == bx && y == by) more = false
        else {
          val e2 = 2 * err
          if (e2 >= dy) { err += dy; x += stepx }
          if (e2 <= dx) { err += dx; y += stepy }
        }
      }
    }
    def vx(c: Coordinate): Int = math.floor((c.x - x0) * sx).toInt
    def vy(c: Coordinate): Int = math.floor((c.y - y0) * sy).toInt
    def polyline(cs: Array[Coordinate]): Unit = {
      var i = 1
      while (i < cs.length) {
        bresenham(vx(cs(i - 1)), vy(cs(i - 1)), vx(cs(i)), vy(cs(i))); i += 1
      }
    }
    def fillPolygon(p: org.locationtech.jts.geom.Polygon): Unit = {
      // ring edges in continuous pixel coordinates (holes included: the
      // even-odd crossing count handles them with no special casing)
      val edges = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
      def addRing(cs: Array[Coordinate]): Unit = {
        var i = 1
        while (i < cs.length) {
          edges += (((cs(i - 1).x - x0) * sx, (cs(i - 1).y - y0) * sy,
                     (cs(i).x - x0) * sx, (cs(i).y - y0) * sy))
          i += 1
        }
      }
      addRing(p.getExteriorRing.getCoordinates)
      var r = 0
      while (r < p.getNumInteriorRing) { addRing(p.getInteriorRingN(r).getCoordinates); r += 1 }
      val env = p.getEnvelopeInternal
      val pyLo = math.max(0, math.floor((env.getMinY - y0) * sy).toInt)
      val pyHi = math.min(h - 1, math.ceil((env.getMaxY - y0) * sy).toInt)
      var py = pyLo
      val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
      while (py <= pyHi) {
        val cy = py + 0.5
        xs.clear()
        edges.foreach { case (ax, ay, bx, by) =>
          if ((ay > cy) != (by > cy)) xs += ax + (cy - ay) * (bx - ax) / (by - ay)
        }
        val sorted = xs.sorted
        var i = 0
        while (i + 1 < sorted.length) {
          // centers strictly inside (xa, xb): px+0.5 > xa and px+0.5 < xb
          // (clamped to the canvas so an off-screen span costs nothing)
          var px = math.max(0, math.floor(sorted(i) - 0.5).toInt + 1)
          val pxHi = math.min(w - 1, math.ceil(sorted(i + 1) - 0.5).toInt - 1)
          while (px <= pxHi) { ink(px, py); px += 1 }
          i += 2
        }
        py += 1
      }
    }
    def draw(g: Geometry): Unit = g match {
      case p: org.locationtech.jts.geom.Point =>
        val px = vx(p.getCoordinate); val py = vy(p.getCoordinate)
        // clamp the dilation square to the canvas BEFORE walking it: the
        // loops are bounded by the canvas, never by pointSize (an absurd
        // pointSize would otherwise spin ~pointSize^2 rejected ink calls);
        // long arithmetic so px + pointSize cannot wrap for an off-canvas px
        var ix = math.max(px.toLong, 0L)
        val ixHi = math.min(px.toLong + pointSize, w.toLong)
        val iy0 = math.max(py.toLong, 0L)
        val iyHi = math.min(py.toLong + pointSize, h.toLong)
        while (ix < ixHi) {
          var iy = iy0
          while (iy < iyHi) { ink(ix.toInt, iy.toInt); iy += 1 }
          ix += 1
        }
      case ls: org.locationtech.jts.geom.LineString => polyline(ls.getCoordinates)
      case p: org.locationtech.jts.geom.Polygon =>
        if (fill) fillPolygon(p)
        else {
          polyline(p.getExteriorRing.getCoordinates)
          var r = 0
          while (r < p.getNumInteriorRing) { polyline(p.getInteriorRingN(r).getCoordinates); r += 1 }
        }
      case gc: org.locationtech.jts.geom.GeometryCollection =>
        var i = 0
        while (i < gc.getNumGeometries) { draw(gc.getGeometryN(i)); i += 1 }
      case other => throw new IllegalArgumentException(
        s"st_raster_pixels: unsupported geometry type ${other.getGeometryType}")
    }
    draw(readGeom(a.getBinary(0)))
    out.closeSorted(w)
  }

  /** Reusable per-thread pixel-dedup state for [[rasterPixels]]: a bitmap
    * over the canvas (index = y*w + x) plus an append buffer of packed
    * pixels. `closeSorted` clears ONLY the bits that were set (O(inked), not
    * O(canvas)) so the bitmap amortizes across rows. */
  private[graft] final class InkBuf {
    private var bits = new Array[Long](0)
    private var buf = new Array[Long](1024)
    private var n = 0
    private var dirty = false
    def open(pixels: Int): Unit = {
      val words = (pixels + 63) >>> 6
      if (bits.length < words) bits = new Array[Long](words)
      // a draw that threw (unsupported geometry, walk guard) never reached
      // closeSorted, so its bits are still set — and Spark reuses executor
      // threads across tasks, so they would silently swallow pixels of the
      // next row on this thread. Pay one full clear on that (rare) path.
      if (dirty) java.util.Arrays.fill(bits, 0L)
      n = 0
      dirty = true
    }
    def add(idx: Int, packed: Long): Unit = {
      val wd = idx >>> 6; val m = 1L << (idx & 63)
      if ((bits(wd) & m) == 0L) {
        bits(wd) |= m
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n << 1)
        buf(n) = packed; n += 1
      }
    }
    def closeSorted(w: Int): Array[Long] = {
      val arr = java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) {
        val p = arr(i)
        val idx = p.toInt * w + (p >>> 32).toInt // y*w + x from pack(x, y)
        bits(idx >>> 6) &= ~(1L << (idx & 63))
        i += 1
      }
      n = 0
      dirty = false
      java.util.Arrays.sort(arr)
      arr
    }
  }
  private val inkBufs = ThreadLocal.withInitial[InkBuf](() => new InkBuf)

  /**
   * The reference's world (Mercator) projection as a geometry transform
   * (Visualization.java:260-280, bit-identical constants): lon/lat vertices
   * map to IMAGE pixel coordinates (y DOWN) for a w×h canvas. Compose with
   * [[rasterPixels]] over window [0,w)×[0,h) and paint without the y flip.
   * Temporal component passes through.
   */
  def mercator(a: InternalRow, w: Int, h: Int): InternalRow = {
    val mapLatBottom = -82.05; val mapLngRight = 180.0; val mapLngLeft = -180.85
    val mapLngDelta = mapLngRight - mapLngLeft
    val worldMapWidth = ((w / mapLngDelta) * 360.0) / (2.0 * math.Pi)
    val mapLatBottomRad = mapLatBottom * math.Pi / 180.0
    val mapOffsetY = worldMapWidth / 2.0 *
      math.log((1.0 + math.sin(mapLatBottomRad)) / (1.0 - math.sin(mapLatBottomRad)))
    val g = readGeom(a.getBinary(0)).copy()
    g.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        val latRad = c.y * math.Pi / 180.0
        val x = (c.x - mapLngLeft) * (w / mapLngDelta)
        val y = h - (worldMapWidth / 2.0 *
          math.log((1.0 + math.sin(latRad)) / (1.0 - math.sin(latRad))) - mapOffsetY)
        c.x = x; c.y = y
      }
    })
    g.geometryChanged()
    // writeGeomKeepZ: the projection rewrites x/y only — a z riding the
    // point (st_point(x,y,z)) must survive the re-encode
    new GenericInternalRow(Array[Any](writeGeomKeepZ(g),
      if (a.isNullAt(1)) null else Long.box(a.getLong(1)),
      if (a.isNullAt(2)) null else Long.box(a.getLong(2))))
  }

  /** Temporal distance = |start difference| (reference teuclid,
    * Distance.scala:129 — made absolute; the reference's signed value is
    * not a metric). Callers (expressions) guard temporal presence. */
  def temporalDistance(a: InternalRow, b: InternalRow): Double =
    math.abs(a.getLong(1) - b.getLong(1)).toDouble

  /** Temporal Hausdorff = max(|Δstart|, |Δend|), open ends collapsing to
    * start (reference thausdorff, Distance.scala:157-163). */
  def temporalHausdorff(a: InternalRow, b: InternalRow): Double = {
    val as = a.getLong(1); val ae = if (a.isNullAt(2)) as else a.getLong(2)
    val bs = b.getLong(1); val be = if (b.isNullAt(2)) bs else b.getLong(2)
    math.max(math.abs(as - bs), math.abs(ae - be)).toDouble
  }

  /** Weighted spatio-temporal distance ws*spatial + wt*temporal (euclid). */
  def stDistance(a: InternalRow, b: InternalRow, ws: Double, wt: Double): Double =
    ws * centroidDistance(a, b) + wt * temporalDistance(a, b)

  /** Is the temporal component present (t_start non-null)? */
  def hasTime(a: InternalRow): Boolean = !a.isNullAt(1)
}
