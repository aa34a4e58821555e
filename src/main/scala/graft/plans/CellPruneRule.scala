package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.locationtech.jts.geom.Envelope

/**
 * Declarative partition pruning for [[graft.sources.CellStore]] layouts —
 * the engine-grade replacement for hand-assembled `part_cx/part_cy` range
 * filters (reference `STSparkContext.getPartitionsToLoad`,
 * src/main/scala/dbis/stark/STSparkContext.scala:658-713, which string-
 * matches a `partition_info` metadata file against the query envelope).
 *
 * A [[graft.sources.CellStore.save]] call records a `_graft_cells` sidecar
 * (cell size + the key/geometry column names). When a query filters such a
 * relation with an `st_*` predicate against a CONSTANT geometry —
 *
 * {{{ CellStore.load(spark, path).filter(stf.st_intersects(col("c_geo"), lit)) }}}
 *
 * — this rule derives the query envelope from the folded literal, converts
 * it to a cell-coordinate range, and conjoins `part_cx/part_cy` bounds to
 * the filter. Catalyst's ordinary file-source planning then turns those
 * bounds into `PartitionFilters`, skipping every non-matching cell
 * directory at file-listing time. The user writes only the spatial
 * predicate; the I/O pruning is implied.
 *
 * Soundness: the added bounds are a NECESSARY condition, never a
 * replacement — every supported predicate (the five `st_*` relations in
 * either argument order, plus `st_within_distance` with a foldable radius,
 * which expands the envelope by the radius) implies the stored point lies
 * inside the (expanded) query envelope, hence its cell lies inside the
 * derived range. Rows in the null partition (null coordinates) are dropped
 * by the bounds, which is sound because every supported predicate is
 * null-intolerant — a null geometry never passes the original filter
 * either. The original predicate always remains and refines exactly.
 *
 * Idempotence / interplay: the rule skips any filter that already
 * references the partition-key columns — its own output, and loads through
 * [[graft.sources.CellStore.loadIntersecting]], which carry explicit
 * bounds.
 */
object CellPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Store metadata as written by `CellStore.save`. `geomCol` names a
    * stored geometry column that is exactly the point (xCol, yCol) —
    * only then is envelope containment cell-exact. `tCol`/`timeBucket`
    * (present together) describe the optional third directory level
    * `part_tb = floor(tCol / timeBucket)`; when `geomCol` is also set, the
    * save contract promises its temporal component IS the `tCol` instant. */
  private[graft] case class CellMeta(cellSize: Double, xCol: String,
                                     yCol: String, geomCol: Option[String],
                                     tCol: Option[String] = None,
                                     timeBucket: Option[Long] = None)

  /** Sidecar lookups are one FS `exists` per distinct root path; cache
    * outcomes (including genuine misses — every non-CellStore parquet read
    * in the session would otherwise pay the probe on each optimization
    * pass). Store layouts are immutable by contract (a rebuild rewrites
    * the same parameters — `CellStore.save` clears this cache so a
    * same-JVM rebuild with DIFFERENT parameters cannot leave stale
    * entries; a cross-JVM parameter change needs a new path). A TRANSIENT
    * read error is NOT cached — pruning is skipped for that pass only, so
    * one filesystem hiccup can't disable pruning for the session. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[CellMeta]]()

  private[graft] def clearMetaCache(): Unit = metaCache.clear()

  private def metaFor(path: String): Option[CellMeta] = {
    val cached = metaCache.get(path)
    if (cached != null) return cached
    val spark = SparkSession.active
    // outer None = transient failure (do not cache); inner Option is the
    // cacheable outcome. (scala.Either is shadowed by Catalyst's
    // string-function Left/Right under the expressions._ import.)
    val resolved: Option[Option[CellMeta]] =
      try {
        if (!graft.sources.Sidecar.exists(spark, path + "/_graft_cells"))
          Some(None) // genuine miss: not a cell store — cacheable
        else {
          val txt = graft.sources.Sidecar.readText(spark, path + "/_graft_cells")
          val kv = txt.linesIterator.map(_.split("=", 2))
            .collect { case Array(k, v) => k -> v }.toMap
          Some(for (cs <- kv.get("cellSize"); x <- kv.get("x"); y <- kv.get("y"))
            yield CellMeta(cs.toDouble, x, y, kv.get("geom").filter(_.nonEmpty),
              kv.get("t").filter(_.nonEmpty), kv.get("timeBucket").map(_.toLong)))
        }
      } catch { case _: Throwable => None } // transient: do not cache
    resolved match {
      case Some(m) => metaCache.put(path, m); m
      case None => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // both optimized shapes: the filter directly on the relation, and the
    // filter above a column-pruning projection (bounds then go UNDER the
    // project, next to the scan)
    case f @ Filter(cond, rel: LogicalRelation) =>
      pruneBounds(cond, rel).map(b => Filter(And(cond, b), rel)).getOrElse(f)
    case f @ Filter(cond, p @ Project(_, rel: LogicalRelation)) =>
      pruneBounds(cond, rel)
        .map(b => Filter(cond, p.copy(child = Filter(b, rel))))
        .getOrElse(f)
  }

  /** Bounds one conjunct implies on the stored row: the query envelope
    * (always, for a supported predicate) and, when derivable, a closed
    * bound on the row's declared instant (`time` = (lo, Some(hi)) or
    * (lo, None) for a right-open query interval). */
  private case class ConjBounds(env: Envelope, time: Option[(Long, Option[Long])])

  /** The part_cx/part_cy (and part_tb) range conjunct implied by `cond`,
    * if this is a cell-store relation, `cond` has a supported
    * constant-geometry spatial conjunct, and no partition-key bound exists
    * yet. */
  private def pruneBounds(cond: Expression,
                          rel: LogicalRelation): Option[Expression] = {
    val fsRel = rel.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val px = rel.output.find(_.name.equalsIgnoreCase("part_cx"))
    val py = rel.output.find(_.name.equalsIgnoreCase("part_cy"))
    if (px.isEmpty || py.isEmpty) return None
    // partition inference yields INT for the cast("int") directory values;
    // any other type (e.g. strings under disabled type inference) would
    // leave the injected comparison against an Int literal unresolved —
    // post-analysis rules insert no implicit casts. Skip rather than break
    // the plan. (The part_tb path carries its own equivalent guard.)
    if (px.get.dataType != org.apache.spark.sql.types.IntegerType ||
        py.get.dataType != org.apache.spark.sql.types.IntegerType)
      return None
    val ptb = rel.output.find(_.name.equalsIgnoreCase("part_tb"))
    // already bounded (our own output, loadIntersecting, or a user filter
    // on the key columns) — nothing to add
    if (cond.references.exists(a =>
        a.name.equalsIgnoreCase("part_cx") || a.name.equalsIgnoreCase("part_cy") ||
        a.name.equalsIgnoreCase("part_tb")))
      return None
    // a multi-path read must resolve to ONE metadata: with different
    // cellSize/key columns per store, bounds computed from one store's
    // grid would silently prune the other store's rows
    val roots = fsRel.location.rootPaths.map(_.toString)
    if (roots.isEmpty) return None
    val metas = roots.map(metaFor)
    if (metas.exists(_.isEmpty) || metas.distinct.length != 1) return None
    val m = metas.head.get

    val bs = splitConjunctivePredicates(cond).flatMap(boundsOf(_, m, rel))
    if (bs.isEmpty) return None
    // several spatial conjuncts: the row must satisfy all, so the cell
    // range follows their intersection
    val env = bs.map(_.env).reduce { (a, b) => a.intersection(b) }
    if (env.isNull) return Some(Literal.FalseLiteral)

    def cellLit(v: Double): Literal =
      Literal(math.max(Int.MinValue.toDouble,
        math.min(Int.MaxValue.toDouble, math.floor(v / m.cellSize))).toInt)
    val spatial: Seq[Expression] = Seq(
      GreaterThanOrEqual(px.get, cellLit(env.getMinX)),
      LessThanOrEqual(px.get, cellLit(env.getMaxX)),
      GreaterThanOrEqual(py.get, cellLit(env.getMinY)),
      LessThanOrEqual(py.get, cellLit(env.getMaxY)))

    // temporal: each conjunct's bound is independently necessary, so the
    // instant must lie in [max(lo_i), min(defined hi_i)]
    val temporal: Seq[Expression] = (ptb, m.timeBucket) match {
      case (Some(tb), Some(bucket)) if bs.exists(_.time.isDefined) &&
          (tb.dataType == org.apache.spark.sql.types.LongType ||
           tb.dataType == org.apache.spark.sql.types.IntegerType) =>
        val times = bs.flatMap(_.time)
        val lo = times.map(_._1).max
        val hiOpt = { val hs = times.flatMap(_._2); if (hs.isEmpty) None else Some(hs.min) }
        if (hiOpt.exists(_ < lo)) return Some(Literal.FalseLiteral)
        // the SAME floor arithmetic as CellStore.save's floor(t / bucket)
        // (double division) — monotone, so [tbLit(lo), tbLit(hi)] covers
        // every bucket a row with instant in [lo, hi] can be stored under.
        // The literal takes the attribute's OWN type: Hive partition
        // inference reads part_tb back as INT when every directory value
        // fits one, and a long literal against an int column would leave
        // the comparison unresolved. Clamping to the int range keeps the
        // bound necessary-only (values beyond it cannot appear in an
        // int-typed partition column anyway).
        def tbLit(v: Long): Literal = {
          val b = math.floor(v.toDouble / bucket).toLong
          if (tb.dataType == org.apache.spark.sql.types.IntegerType)
            Literal(math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, b)).toInt)
          else Literal(b)
        }
        Seq(GreaterThanOrEqual(tb, tbLit(lo))) ++
          hiOpt.map(h => LessThanOrEqual(tb, tbLit(h)))
      case _ => Seq.empty
    }
    Some((spatial ++ temporal).reduce(And))
  }

  /** Bounds implied by one conjunct, when its data side is the store's key
    * geometry and its query side folds to a constant. */
  private def boundsOf(conjunct: Expression, m: CellMeta,
                       rel: LogicalRelation): Option[ConjBounds] = conjunct match {
    case p: STRelate if p.deterministic =>
      storeKeySide(p.left, m, rel) match {
        case Some(hasInstant) => constBounds(p.right, m, hasInstant)
        case None => storeKeySide(p.right, m, rel)
          .flatMap(hasInstant => constBounds(p.left, m, hasInstant))
      }
    case p: STWithinDistance if p.deterministic && p.third.foldable =>
      Option(p.third.eval()).map(_.asInstanceOf[Double]).filter(_ >= 0).flatMap { d =>
        val e =
          if (storeKeySide(p.first, m, rel).isDefined) constBounds(p.second, m, dataHasInstant = false)
          else if (storeKeySide(p.second, m, rel).isDefined) constBounds(p.first, m, dataHasInstant = false)
          else None
        // st_within_distance has no temporal gate (GeoOps.withinDistance) —
        // spatial expansion only, never a time bound
        e.map { cb => val x = new Envelope(cb.env); x.expandBy(d); ConjBounds(x, None) }
      }
    case _ => None
  }

  /** Temporal wrappers don't move the geometry — see through them. */
  private def unwrapTime(e: Expression): Expression = e match {
    case STWithTime(g, _, _)     => unwrapTime(g)
    case STWithInstant(g, _)     => unwrapTime(g)
    case STWithOpenInterval(g, _) => unwrapTime(g)
    case other => other
  }

  /** Is `e` the store's OWN geometry, and does it carry the DECLARED
    * instant? None = not the store key (no pruning from this conjunct);
    * Some(hasInstant) = spatial match, with `hasInstant` true only when
    * the expression's temporal component is provably the sidecar's `tCol`
    * — the declared geometry column (whose save contract promises it), or
    * an explicit `st_with_instant(st_point(x, y), t)` over the declared
    * columns. Matched by exprId against the relation (a same-named alias
    * computed after the load must not trigger pruning). Only `hasInstant`
    * conjuncts may contribute part_tb bounds: the temporal gate of every
    * st_* predicate (GeoOps.relate — both-present ⇒ the relation holds,
    * and all five relations imply interval overlap) then forces the
    * instant into the constant's closed time range. */
  private def storeKeySide(e: Expression, m: CellMeta,
                           rel: LogicalRelation): Option[Boolean] = {
    def spatialMatch(g: Expression): Boolean = g match {
      case a: AttributeReference =>
        rel.outputSet.contains(a) && m.geomCol.exists(_.equalsIgnoreCase(a.name))
      case STPoint(x: AttributeReference, y: AttributeReference) =>
        rel.outputSet.contains(x) && rel.outputSet.contains(y) &&
          x.name.equalsIgnoreCase(m.xCol) && y.name.equalsIgnoreCase(m.yCol)
      case STPointZ(x: AttributeReference, y: AttributeReference, _) =>
        rel.outputSet.contains(x) && rel.outputSet.contains(y) &&
          x.name.equalsIgnoreCase(m.xCol) && y.name.equalsIgnoreCase(m.yCol)
      case _ => false
    }
    e match {
      // the bare declared geometry column: its instant IS tCol by the save
      // contract (when one was declared)
      case a: AttributeReference if spatialMatch(a) => Some(m.tCol.isDefined)
      // explicit instant constructor over the declared columns
      case STWithInstant(g, t: AttributeReference)
          if spatialMatch(unwrapTime(g)) && rel.outputSet.contains(t) =>
        Some(m.tCol.exists(_.equalsIgnoreCase(t.name)))
      // any other temporal wrapper (interval, open interval, non-attribute
      // instant): spatial pruning only
      case other if spatialMatch(unwrapTime(other)) => Some(false)
      case _ => None
    }
  }

  /** Envelope + temporal component of a foldable stobj expression (literal
    * WKT/box/point, optionally time-wrapped). The time bound is emitted
    * only when the data side carries the declared instant AND the constant
    * has a time component (`t_start` non-null; `t_end` null = right-open). */
  private def constBounds(q: Expression, m: CellMeta,
                          dataHasInstant: Boolean): Option[ConjBounds] =
    if (!q.foldable) None
    else try {
      Option(q.eval()).map { v =>
        val row = v.asInstanceOf[InternalRow]
        val env = GeoOps.readGeom(row.getBinary(0)).getEnvelopeInternal
        val time =
          if (dataHasInstant && !row.isNullAt(1))
            Some((row.getLong(1), if (row.isNullAt(2)) None else Some(row.getLong(2))))
          else None
        ConjBounds(env, time)
      }
    } catch { case _: Throwable => None }
}
