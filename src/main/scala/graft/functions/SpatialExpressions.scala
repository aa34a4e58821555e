package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Catalyst expression library for the `stobj` column type.
 *
 * Mirrors the reference's SQL function surface (reference
 * src/main/scala/dbis/stark/sql/Functions.scala:16-48 and
 * sql/spatial/STPredicate.scala, STConstructor.scala, STFunction.scala) but as
 * codegen-friendly expressions: each `doGenCode` emits a static call into
 * [[GeoOps]], so the expression participates in whole-stage codegen instead of
 * the reference's per-row CodegenFallback.
 */
object SpatialExpressions {
  // shorthand used by the expressions below
  private[functions] def row(v: Any): InternalRow = v.asInstanceOf[InternalRow]
}

import SpatialExpressions.row

/** st_geomfromwkt(wkt) → stobj (no time). */
case class STGeomFromWKT(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    GeoOps.fromWkt(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoOps.fromWkt($c)")
  override protected def withNewChildInternal(c: Expression): STGeomFromWKT = copy(child = c)
  override def prettyName: String = "st_geomfromwkt"
}

/** st_point(x, y) → stobj point (no time). */
case class STPoint(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(x: Any, y: Any): Any =
    GeoOps.mkPoint(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.GeoOps.mkPoint($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STPoint =
    copy(left = l, right = r)
  override def prettyName: String = "st_point"
}

/** st_point(x, y, z) → stobj 3-D point (no time). Z is carried through WKB
  * and read back by st_z; predicates/distances stay XY (reference
  * STObject.scala:245-248 semantics — its JTS predicates also ignore z). */
case class STPointZ(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(x: Any, y: Any, z: Any): Any =
    GeoOps.mkPointZ(x.asInstanceOf[Double], y.asInstanceOf[Double], z.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) => s"graft.functions.GeoOps.mkPointZ($x, $y, $z)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): STPointZ =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "st_point"
}

/** st_z(sto): z of the first coordinate; NULL when the geometry has no z. */
case class STZ(child: Expression) extends UnaryExpression with codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val z = GeoOps.stZ(row(a))
    if (java.lang.Double.isNaN(z)) null else z
  }
  override protected def withNewChildInternal(c: Expression): STZ = copy(child = c)
  override def prettyName: String = "st_z"
}

/** st_box(minx, miny, maxx, maxy) → axis-aligned rectangle polygon (no time). */
case class STMakeBox(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoOps.mkBox(a.asInstanceOf[Double], b.asInstanceOf[Double],
                 c.asInstanceOf[Double], d.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.functions.GeoOps.mkBox($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): STMakeBox =
    copy(first = a, second = b, third = c, fourth = d)
  override def prettyName: String = "st_box"
}

/** st_with_time(sto, t_start, t_end) → stobj with a closed interval (instant if equal). */
case class STWithTime(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(sto: Any, s: Any, e: Any): Any =
    GeoOps.withTime(row(sto), s.asInstanceOf[Long], e.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s, e) => s"graft.functions.GeoOps.withTime($a, $s, $e)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): STWithTime =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "st_with_time"
}

/** st_with_instant(sto, t) → stobj with an instant time component. */
case class STWithInstant(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(sto: Any, t: Any): Any =
    GeoOps.withInstant(row(sto), t.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, t) => s"graft.functions.GeoOps.withInstant($a, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STWithInstant =
    copy(left = l, right = r)
  override def prettyName: String = "st_with_instant"
}

/** st_with_open_interval(sto, t_start) → stobj with right-open interval. */
case class STWithOpenInterval(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(sto: Any, s: Any): Any =
    GeoOps.withOpenInterval(row(sto), s.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) => s"graft.functions.GeoOps.withOpenInterval($a, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STWithOpenInterval =
    copy(left = l, right = r)
  override def prettyName: String = "st_with_open_interval"
}

/**
 * The five spatio-temporal predicates (op ∈ GeoOps.{INTERSECTS..COVEREDBY}).
 * Semantics: spatial relation AND (both times absent OR both present and the
 * temporal relation holds) — reference src/main/scala/dbis/stark/STObject.scala:35-89.
 */
case class STRelate(left: Expression, right: Expression, op: Int) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = GeoOps.relate(row(a), row(b), op)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.relate($a, $b, $op)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STRelate =
    copy(left = l, right = r)
  override def prettyName: String = op match {
    case GeoOps.INTERSECTS  => "st_intersects"
    case GeoOps.CONTAINS    => "st_contains"
    case GeoOps.CONTAINEDBY => "st_containedby"
    case GeoOps.COVERS      => "st_covers"
    case GeoOps.COVEREDBY   => "st_coveredby"
  }
}

/** st_distance(a, b): minimum distance between the geometries (JTS). */
case class STDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = GeoOps.distance(row(a), row(b))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.distance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STDistance =
    copy(left = l, right = r)
  override def prettyName: String = "st_distance"
}

/** st_centroid_distance(a, b): reference's default distance (Distance.scala:118-128). */
case class STCentroidDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = GeoOps.centroidDistance(row(a), row(b))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.centroidDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STCentroidDistance =
    copy(left = l, right = r)
  override def prettyName: String = "st_centroid_distance"
}

/** st_within_distance(a, b, d): envelope-prefiltered distance predicate. */
case class STWithinDistance(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any, d: Any): Any =
    GeoOps.withinDistance(row(a), row(b), d.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, d) => s"graft.functions.GeoOps.withinDistance($a, $b, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): STWithinDistance =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "st_within_distance"
}

/** Double-valued unary accessors over stobj. */
case class STDoubleAccessor(child: Expression, func: String) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = func match {
    case "stX"  => GeoOps.stX(row(a))
    case "stY"  => GeoOps.stY(row(a))
    case "area" => GeoOps.area(row(a))
    case "minX" => GeoOps.minX(row(a))
    case "maxX" => GeoOps.maxX(row(a))
    case "minY" => GeoOps.minY(row(a))
    case "maxY" => GeoOps.maxY(row(a))
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoOps.$func($c)")
  override protected def withNewChildInternal(c: Expression): STDoubleAccessor = copy(child = c)
  override def prettyName: String = func match {
    // registered SQL names, not the kernel method names ("stX" is st_x,
    // not st_stx — plans must render the name users can grep for)
    case "stX" => "st_x"
    case "stY" => "st_y"
    case other => "st_" + other.toLowerCase
  }
}

/** st_wkt(sto) → WKT string. */
case class STAsWKT(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = GeoOps.asWkt(row(a))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoOps.asWkt($c)")
  override protected def withNewChildInternal(c: Expression): STAsWKT = copy(child = c)
  override def prettyName: String = "st_wkt"
}

/** st_cell(sto, cellSize) → grid cell id of the centroid (partitioning key). */
case class STCellId(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, cs: Any): Any = GeoOps.cellId(row(a), cs.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, cs) => s"graft.functions.GeoOps.cellId($a, $cs)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STCellId =
    copy(left = l, right = r)
  override def prettyName: String = "st_cell"
}

/** st_cells(sto, cellSize[, radius]) → all cells of the (expanded) envelope. */
case class STCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, cs: Any, r: Any): Any = {
    val radius = r.asInstanceOf[Double]
    val arr = if (radius == 0d) GeoOps.cells(row(a), cs.asInstanceOf[Double])
              else GeoOps.cellsExpanded(row(a), cs.asInstanceOf[Double], radius)
    new GenericArrayData(arr)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): STCells =
    copy(first = f, second = s, third = t)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, cs, r) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"($r == 0.0d) ? graft.functions.GeoOps.cells($a, $cs)" +
      s" : graft.functions.GeoOps.cellsExpanded($a, $cs, $r))")
  override def prettyName: String = "st_cells"
}

/**
 * st_ref_cell(a, b, cellSize, cell[, radius]) — true iff `cell` is the cell of
 * the lower-left corner of envelope(a)∩envelope(b) (a expanded by radius).
 * The duplicate-elimination predicate of the cell-replicate spatial join.
 */
case class STRefCell(children: Seq[Expression])
    extends Expression with codegen.CodegenFallback {
  require(children.size == 5)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val r = vs(4).asInstanceOf[Double]
      if (r == 0d)
        GeoOps.refPointInCell(row(vs(0)), row(vs(1)), vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Long])
      else
        GeoOps.refPointInCellDist(row(vs(0)), row(vs(1)), r, vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Long])
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): STRefCell =
    copy(children = cs)
  override def prettyName: String = "st_ref_cell"
}

/** Exact floor-division time-bucket id of a long epoch — the Catalyst twin
  * of [[graft.operators.TemporalJoin.bucketOf]] (Math.floorDiv, exact at
  * every magnitude incl. past 2^53). Internal to
  * [[graft.plans.RangeJoinRule]]'s rewrite. */
case class IntervalBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(c: Any, b: Any): Any =
    java.lang.Math.floorDiv(c.asInstanceOf[Long], b.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, b) => s"java.lang.Math.floorDiv($c, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntervalBucket =
    copy(left = l, right = r)
  override def prettyName: String = "st_t_bucket"
}

/**
 * st_t_ref_bucket(ls, rs, bucket, cell) — true iff `cell` is the bucket of
 * max(ls, rs), the instant where an overlapping interval pair first
 * coexists: the duplicate-elimination predicate of the bucket-replicate
 * interval join (the temporal twin of [[STRefCell]]), and the structural
 * idempotence marker of [[graft.plans.RangeJoinRule]].
 */
case class IntervalReportBucket(first: Expression, second: Expression,
                                third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(ls: Any, rs: Any, b: Any, cell: Any): Any =
    cell.asInstanceOf[Long] == java.lang.Math.floorDiv(
      math.max(ls.asInstanceOf[Long], rs.asInstanceOf[Long]), b.asInstanceOf[Long])
  // codegen'd, not fallback: this refine runs once per bucket-collision
  // candidate — tens of millions of rows at scale (measured: the
  // interpreted form cost q239 2.4x the operator API at sf1)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ls, rs, b, cell) =>
      s"$cell == java.lang.Math.floorDiv(java.lang.Math.max($ls, $rs), $b)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): IntervalReportBucket =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "st_t_ref_bucket"
}

/** st_hausdorff(a, b): discrete Hausdorff distance (reference shausdorff). */
case class STHausdorff(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = GeoOps.hausdorffDistance(row(a), row(b))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.hausdorffDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STHausdorff =
    copy(left = l, right = r)
  override def prettyName: String = "st_hausdorff"
}

/** st_max_distance(a, b): maximum distance between the geometries (vertex
  * pairs; exact — see GeoOps.maxDistance). min=st_distance / max=this form
  * the reference's IntervalDistance (Distance.scala:27-80). */
case class STMaxDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = GeoOps.maxDistance(row(a), row(b))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.maxDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STMaxDistance =
    copy(left = l, right = r)
  override def prettyName: String = "st_max_distance"
}

/** st_t_distance(a, b): |start difference| (reference teuclid). NULL when
  * either side lacks a temporal component — never a garbage 0. */
case class STTemporalDistance(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ra, rb) = (row(a), row(b))
    if (GeoOps.hasTime(ra) && GeoOps.hasTime(rb)) GeoOps.temporalDistance(ra, rb) else null
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STTemporalDistance =
    copy(left = l, right = r)
  override def prettyName: String = "st_t_distance"
}

/** st_thausdorff(a, b): max(|Δstart|, |Δend|) (reference thausdorff). NULL
  * when either side lacks time. */
case class STTemporalHausdorff(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ra, rb) = (row(a), row(b))
    if (GeoOps.hasTime(ra) && GeoOps.hasTime(rb)) GeoOps.temporalHausdorff(ra, rb) else null
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STTemporalHausdorff =
    copy(left = l, right = r)
  override def prettyName: String = "st_thausdorff"
}

/** st_st_distance(a, b, ws, wt): weighted space+time distance (euclid).
  * NULL when either side lacks time (the temporal term is undefined). */
case class STWeightedDistance(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
    extends QuaternaryExpression with codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any, ws: Any, wt: Any): Any = {
    val (ra, rb) = (row(a), row(b))
    if (GeoOps.hasTime(ra) && GeoOps.hasTime(rb))
      GeoOps.stDistance(ra, rb, ws.asInstanceOf[Double], wt.asInstanceOf[Double])
    else null
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): STWeightedDistance =
    copy(first = a, second = b, third = c, fourth = d)
  override def prettyName: String = "st_st_distance"
}

/**
 * st_raster_pixels(sto, x0, y0, x1, y1, w, h, fill, pointSize) →
 * array<long> of packed (px << 32 | py) pixels the geometry inks on a w×h
 * canvas over world window [x0,x1)×[y0,y1) — the kernel of the distributed
 * visualization sink (see GeoOps.rasterPixels for the drawing rules).
 */
case class STRasterPixels(children: Seq[Expression])
    extends Expression with codegen.CodegenFallback {
  require(children.size == 9)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else new GenericArrayData(GeoOps.rasterPixels(row(vs(0)),
      vs(1).asInstanceOf[Double], vs(2).asInstanceOf[Double],
      vs(3).asInstanceOf[Double], vs(4).asInstanceOf[Double],
      vs(5).asInstanceOf[Int], vs(6).asInstanceOf[Int],
      vs(7).asInstanceOf[Boolean], vs(8).asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): STRasterPixels =
    copy(children = cs)
  override def prettyName: String = "st_raster_pixels"
}

/** st_mercator(sto, w, h): the reference's world (Mercator) projection as a
  * geometry transform into IMAGE pixel coordinates (y down) — see
  * GeoOps.mercator. */
case class STMercator(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = GeoOps.stobjType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, w: Any, h: Any): Any =
    GeoOps.mercator(row(a), w.asInstanceOf[Int], h.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, w, h) => s"graft.functions.GeoOps.mercator($a, $w, $h)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): STMercator =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "st_mercator"
}

/** st_before(a, b) / st_after(a, b): the reference's temporal ordering
  * predicates (STObject.scala:91-93 `before`/`after` via Interval.`<`,
  * Interval.scala:50-53): a < b iff a's end is defined, a.start < b.start,
  * and (b open-ended or a.end < b.end). Our degenerate-instant encoding
  * (instant = [v, v]) makes the reference's separate Instant formula
  * (Instant.scala:29, start-only compare) coincide with the interval one:
  * v < b.start implies v < b.end since b.end >= b.start. `after` is the
  * reference's `o < this` swap. A time-less side yields NULL — the
  * reference returns None for a time-less receiver and NPEs on a time-less
  * argument; uniform SQL NULL is the deliberate fix, not copied. */
case class STTemporalOrder(left: Expression, right: Expression, after: Boolean)
    extends BinaryExpression with codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = if (after) (row(b), row(a)) else (row(a), row(b))
    if (x.isNullAt(1) || y.isNullAt(1)) null
    else java.lang.Boolean.valueOf(
      !x.isNullAt(2) && x.getLong(1) < y.getLong(1) &&
        (y.isNullAt(2) || x.getLong(2) < y.getLong(2)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): STTemporalOrder =
    copy(left = l, right = r)
  override def prettyName: String = if (after) "st_after" else "st_before"
}

/** st_tcenter(sto) / st_tlength(sto): the reference's Interval.center /
  * Interval.length (Interval.scala:42-44; integer midpoint). NULL when time
  * is absent or open-ended (the reference's None). An instant has center =
  * itself, length = 0 — the degenerate interval agrees. */
case class STTemporalStat(child: Expression, center: Boolean)
    extends UnaryExpression with codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val r = row(a)
    if (r.isNullAt(1) || r.isNullAt(2)) null
    else {
      val s = r.getLong(1); val e = r.getLong(2)
      java.lang.Long.valueOf(if (center) s + (e - s) / 2 else e - s)
    }
  }
  override protected def withNewChildInternal(c: Expression): STTemporalStat = copy(child = c)
  override def prettyName: String = if (center) "st_tcenter" else "st_tlength"
}

/** st_tstart(sto) / st_tend(sto): nullable temporal bounds. */
case class STTemporalAccessor(child: Expression, end: Boolean)
    extends UnaryExpression with codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val r = row(a); val ord = if (end) 2 else 1
    if (r.isNullAt(ord)) null else r.getLong(ord)
  }
  override protected def withNewChildInternal(c: Expression): STTemporalAccessor = copy(child = c)
  override def prettyName: String = if (end) "st_tend" else "st_tstart"
}
