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
    * only then is envelope containment cell-exact. */
  private[graft] case class CellMeta(cellSize: Double, xCol: String,
                                     yCol: String, geomCol: Option[String])

  /** Sidecar lookups are one FS `exists` per distinct root path; cache
    * outcomes (including misses — every non-CellStore parquet read in the
    * session would otherwise pay the probe on each optimization pass).
    * Store layouts are immutable by contract (a rebuild rewrites the same
    * parameters), so entries never invalidate. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[CellMeta]]()

  private[graft] def clearMetaCache(): Unit = metaCache.clear()

  private def metaFor(path: String): Option[CellMeta] =
    metaCache.computeIfAbsent(path, { p =>
      try {
        val txt = graft.sources.Sidecar.readText(
          SparkSession.active, p + "/_graft_cells")
        val kv = txt.linesIterator.map(_.split("=", 2))
          .collect { case Array(k, v) => k -> v }.toMap
        for (cs <- kv.get("cellSize"); x <- kv.get("x"); y <- kv.get("y"))
          yield CellMeta(cs.toDouble, x, y, kv.get("geom").filter(_.nonEmpty))
      } catch { case _: Throwable => None }
    })

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

  /** The part_cx/part_cy range conjunct implied by `cond`, if this is a
    * cell-store relation, `cond` has a supported constant-geometry spatial
    * conjunct, and no partition-key bound exists yet. */
  private def pruneBounds(cond: Expression,
                          rel: LogicalRelation): Option[Expression] = {
    val fsRel = rel.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val px = rel.output.find(_.name.equalsIgnoreCase("part_cx"))
    val py = rel.output.find(_.name.equalsIgnoreCase("part_cy"))
    if (px.isEmpty || py.isEmpty) return None
    // already bounded (our own output, loadIntersecting, or a user filter
    // on the key columns) — nothing to add
    if (cond.references.exists(a =>
        a.name.equalsIgnoreCase("part_cx") || a.name.equalsIgnoreCase("part_cy")))
      return None
    val root = fsRel.location.rootPaths.headOption.map(_.toString).getOrElse(return None)
    val m = metaFor(root).getOrElse(return None)

    val envs = splitConjunctivePredicates(cond).flatMap(envelopeOf(_, m, rel))
    if (envs.isEmpty) return None
    // several spatial conjuncts: the row must satisfy all, so the cell
    // range follows their intersection
    val env = envs.reduce { (a, b) => a.intersection(b) }
    if (env.isNull) return Some(Literal.FalseLiteral)

    def cellLit(v: Double): Literal =
      Literal(math.max(Int.MinValue.toDouble,
        math.min(Int.MaxValue.toDouble, math.floor(v / m.cellSize))).toInt)
    val bounds: Seq[Expression] = Seq(
      GreaterThanOrEqual(px.get, cellLit(env.getMinX)),
      LessThanOrEqual(px.get, cellLit(env.getMaxX)),
      GreaterThanOrEqual(py.get, cellLit(env.getMinY)),
      LessThanOrEqual(py.get, cellLit(env.getMaxY)))
    Some(bounds.reduce(And))
  }

  /** Query envelope implied by one conjunct, when its data side is the
    * store's key geometry and its query side folds to a constant. */
  private def envelopeOf(conjunct: Expression, m: CellMeta,
                         rel: LogicalRelation): Option[Envelope] = conjunct match {
    case p: STRelate if p.deterministic =>
      if (isStoreKey(p.left, m, rel)) constEnv(p.right)
      else if (isStoreKey(p.right, m, rel)) constEnv(p.left)
      else None
    case p: STWithinDistance if p.deterministic && p.third.foldable =>
      Option(p.third.eval()).map(_.asInstanceOf[Double]).filter(_ >= 0).flatMap { d =>
        val e =
          if (isStoreKey(p.first, m, rel)) constEnv(p.second)
          else if (isStoreKey(p.second, m, rel)) constEnv(p.first)
          else None
        e.map { env => val x = new Envelope(env); x.expandBy(d); x }
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

  /** Data side must be the store's OWN geometry: the declared geometry
    * column, or the point built from the declared key columns — matched by
    * exprId against the relation (a same-named alias computed after the
    * load must not trigger pruning). */
  private def isStoreKey(e: Expression, m: CellMeta, rel: LogicalRelation): Boolean =
    unwrapTime(e) match {
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

  /** Envelope of a foldable stobj expression (literal WKT/box/point). */
  private def constEnv(q: Expression): Option[Envelope] =
    if (!q.foldable) None
    else try {
      Option(q.eval()).map { v =>
        GeoOps.readGeom(v.asInstanceOf[InternalRow].getBinary(0)).getEnvelopeInternal
      }
    } catch { case _: Throwable => None }
}
