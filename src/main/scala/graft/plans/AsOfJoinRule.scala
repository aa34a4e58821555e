package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Last
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/**
 * Logical rewrite for SQL as-of joins — the third member of the rewrite
 * family ([[SpatialJoinRule]], [[RangeJoinRule]]), completing the SQL
 * surface of [[graft.operators.TemporalJoin.asOfKeyed]] (the reference's
 * SQL layer plans typed kernels from declarative shapes the same way —
 * reference src/main/scala/dbis/stark/sql/StarkStrategy.scala:47-81).
 *
 * The as-of shape a SQL user actually writes (DuckDB spells it `ASOF
 * JOIN`; plain SQL spells it rank-and-keep-one):
 *
 * {{{
 *   SELECT ... FROM (
 *     SELECT l.*, r.*, row_number() OVER (
 *       PARTITION BY l.id ORDER BY r.t DESC [, r.tb DESC]) AS rn
 *     FROM l JOIN r
 *       ON r.k = l.k AND r.t <= l.t [AND r.t > l.t - lookback]
 *   ) WHERE rn = 1
 * }}}
 *
 * Spark plans the inner join as a per-key pair EXPLOSION (every right row
 * at-or-before every left row of the same key meets the join output
 * before the window discards all but one per left row) — candidate count
 * grows as per-key density², the exact pathology the carry-forward
 * operator kernel was rewritten to avoid (measured 0.64 s → 131 s at 10×
 * density on q43). Under `spark.graft.join.asof = true` this rule
 * replaces the whole Filter-over-Window-over-Join subtree with the
 * carry-forward timeline:
 *
 * {{{
 *   Project(original output,
 *     Filter(g = 1 AND w IS NOT NULL [AND w.t > lookback bounds],
 *       Window(last(if(g = 0, struct(t, r-struct), null), ignoreNulls)
 *                OVER (PARTITION BY join keys
 *                      ORDER BY t, g [, tie keys reversed]
 *                      ROWS UNBOUNDED PRECEDING..CURRENT) AS w,
 *         Union(left rows as g=1, right rows as g=0))))
 * }}}
 *
 * — one union, one hash-partition-by-key window pass, zero join: each
 * left row reads the single latest preceding right row of its key
 * directly, O(n log n) at ANY per-key density. At equal instants rights
 * sort before lefts for `r.t <= l.t` and after them for the strict
 * `r.t < l.t`, so bound inclusivity is exact; descending tie keys rank
 * the user's rank-1 right LAST in timeline order, where `last()` picks
 * it. Lookback conjuncts (any lower bound `r.t >/≥ f(left)`) post-filter
 * the CARRIED time exactly: every lower bound is monotone in r.t, so if
 * the latest right fails it, every earlier right fails it too, and the
 * user's query emits nothing for that left row either.
 *
 * Exactness contracts (why the rewrite is opt-in):
 *  - the window PARTITION BY must functionally identify a left row (it
 *    is the row id in every real as-of query; with duplicate ids the
 *    user's own row_number query already returns an arbitrary survivor
 *    per id — semantics no rewrite can preserve);
 *  - ties beyond the given ORDER BY keys are arbitrary on both sides
 *    (same contract the operator API documents: (t, tie keys) unique
 *    per key among right rows).
 *
 * Declines (plan left untouched, Spark's own InferWindowGroupLimit still
 * applies): non-inner joins, window partition keys referencing the right
 * side, order keys with non-default null ordering or referencing the
 * left side, any join conjunct that is not a cross-side equality / the
 * single upper bound on one right expression / a lower bound on that
 * same expression, extra window expressions in the same Window node, and
 * a window partition list that is empty (a global rank-1 keeps one row
 * TOTAL — not an as-of join). NULL keys and NULL times match nothing
 * under SQL comparison semantics; the timeline drops them on entry.
 *
 * Scale note: with no key equality the carry window has an empty
 * PARTITION BY — a single-partition sort. Still strictly better than the
 * quadratic pair explosion it replaces, but the typed
 * [[graft.operators.TemporalJoin.asOf]] (range-partitioned timeline with
 * driver-healed boundaries) is the unkeyed scale path; this rule
 * therefore requires at least one equality key and declines otherwise.
 */
object AsOfJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.join.asof", "false").equalsIgnoreCase("true")

  /** rank-1 filters: rn = 1, 1 = rn, rn <= 1, rn < 2 (row_number >= 1
    * always, so these are equivalent). */
  private def isRankOne(e: Expression, rn: ExprId): Boolean = e match {
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) => a.exprId == rn
    case EqualTo(IntegerLiteral(1), a: AttributeReference) => a.exprId == rn
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(1)) => a.exprId == rn
    case LessThan(a: AttributeReference, IntegerLiteral(2)) => a.exprId == rn
    case GreaterThanOrEqual(IntegerLiteral(1), a: AttributeReference) => a.exprId == rn
    case GreaterThan(IntegerLiteral(2), a: AttributeReference) => a.exprId == rn
    case _ => false
  }

  private def rankFrame(f: Expression): Boolean = f match {
    case WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
      UnboundedPreceding, CurrentRow)) => true
    case WindowSpecDefinition(_, _, UnspecifiedFrame) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(fc,
          w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber, wsd), _)),
            ps, os, wchild, _)) if rankFrame(wsd) =>
        val fConj = splitConjunctivePredicates(fc)
        val (rankConj, residual) = fConj.partition(isRankOne(_, al.exprId))
        if (rankConj.isEmpty || residual.exists(_.references.contains(al.toAttribute))) f
        else rewrite(w, al, ps, os, wchild) match {
          case Some(r) =>
            if (residual.isEmpty) r else Filter(residual.reduce(And), r)
          case None => f
        }
    }
  }

  /** The Window's child: a bare inner Join, or the attributes-only
    * Project that ColumnPruning inserts over it (the pruned output
    * becomes the packed width — a win, not an obstacle). When this rule
    * runs from `spark.experimental.extraOptimizations` (the
    * stf.register path) it executes AFTER Spark's own
    * InferWindowGroupLimit batch, which has already inserted a
    * WindowGroupLimit below the Window for the very rank-1 filter we
    * match — a per-partition pre-filter the full rewrite subsumes, so
    * it unwraps transparently. (From injectOptimizerRule the rule runs
    * inside operator optimization, before that batch — both positions
    * see through this.) */
  private def joinBelow(p: LogicalPlan): Option[(Join, Seq[Attribute])] = {
    val inner = p match {
      case WindowGroupLimit(_, _, _, _, c) => c
      case other => other
    }
    inner match {
      case j @ Join(_, _, Inner | LeftOuter, Some(_), _) => Some((j, j.output))
      case Project(pl, j @ Join(_, _, Inner | LeftOuter, Some(_), _))
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        Some((j, pl.map(_.asInstanceOf[AttributeReference])))
      case _ => None
    }
  }

  private def rewrite(w: Window, rnAlias: Alias, ps: Seq[Expression],
                      os: Seq[SortOrder], wchild: LogicalPlan)
      : Option[LogicalPlan] = {
    val (j, visible) = joinBelow(wchild).getOrElse(return None)
    val outer = j.joinType == LeftOuter
    val cond = j.condition.get
    if (!cond.deterministic) return None
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet

    // ---- window spec checks ----
    // partition keys: left-side only, non-empty (the left row identity)
    if (ps.isEmpty || ps.exists(p => !p.deterministic ||
        p.references.isEmpty || !p.references.subsetOf(leftOut))) return None
    if (os.isEmpty) return None
    // primary order key: r.t DESC with the default null ordering
    val rt = os.head match {
      case SortOrder(e, Descending, NullsLast, _)
          if e.deterministic && e.references.nonEmpty &&
            e.references.subsetOf(rightOut) => e
      case _ => return None
    }
    // tie keys: right-side, default null orderings; timeline rank
    // reversal = flip the direction (last-in-reversed-order = rank 1)
    val ties = os.tail.map {
      case SortOrder(e, Descending, NullsLast, _)
          if e.deterministic && e.references.subsetOf(rightOut) =>
        (e, Ascending: SortDirection)
      case SortOrder(e, Ascending, NullsFirst, _)
          if e.deterministic && e.references.subsetOf(rightOut) =>
        (e, Descending: SortDirection)
      case _ => return None
    }

    // ---- join condition decomposition ----
    val conjuncts = splitConjunctivePredicates(cond)
    val keys = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    val uppers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression, Boolean)]
    val lowers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression, Boolean)]
    conjuncts.foreach { c =>
      // normalize every inequality to (lo </<= hi, strict)
      val norm = c match {
        case LessThanOrEqual(a, b) => Some((a, b, false))
        case LessThan(a, b) => Some((a, b, true))
        case GreaterThanOrEqual(a, b) => Some((b, a, false))
        case GreaterThan(a, b) => Some((b, a, true))
        case _ => None
      }
      c match {
        case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut) =>
          keys += ((a, b))
        case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut) =>
          keys += ((b, a))
        case _ => norm match {
          case Some((lo, hi, s)) if lo.references.nonEmpty && hi.references.nonEmpty &&
              lo.references.subsetOf(rightOut) && hi.references.subsetOf(leftOut) =>
            uppers += ((lo, hi, s)) // r-expr bounded above by l-expr
          case Some((lo, hi, s)) if lo.references.nonEmpty && hi.references.nonEmpty &&
              lo.references.subsetOf(leftOut) && hi.references.subsetOf(rightOut) =>
            lowers += ((lo, hi, s)) // r-expr bounded below by l-expr
          case _ => return None // anything else: not the as-of shape
        }
      }
    }
    if (keys.isEmpty) return None // unkeyed: typed asOf is the scale path
    if (uppers.size != 1) return None
    val (rtBound, lt, strict) = uppers.head
    // the bounded right expr IS the ranked one, and every lower bound is
    // on that same expression (the monotone post-filter argument)
    if (!rtBound.semanticEquals(rt)) return None
    if (!lowers.forall(_._2.semanticEquals(rt))) return None
    if (lt.dataType != rt.dataType || !RowOrdering.isOrderable(rt.dataType)) return None
    if (keys.exists { case (a, b) => a.dataType != b.dataType ||
        !RowOrdering.isOrderable(a.dataType) }) return None

    // ---- the carry-forward timeline ----
    val visL = visible.filter(leftOut.contains)
    val visR = visible.filter(rightOut.contains)
    // left attrs the post-filters need beyond the visible ones
    val lCarry = (visL ++ lowers.flatMap(_._1.references)
      .filter(leftOut.contains)).distinct
    def nn(es: Seq[Expression]): Expression =
      es.map(IsNotNull(_): Expression).reduce(And)
    // LEFT OUTER keeps every left row — including NULL-keyed/timed ones,
    // which ride the timeline unmatched (rights are still null-filtered,
    // so a NULL-key window partition holds no rights to carry)
    val leftF = if (outer) j.left
      else Filter(nn(lt +: keys.toSeq.map(_._1)), j.left)
    val rightF = Filter(nn(rt +: keys.toSeq.map(_._2)), j.right)

    val rvStruct = CreateNamedStruct(
      visR.flatMap(a => Seq(Literal(a.name), a)).toSeq)
    val rvType = StructType(visR.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    def na(name: String, dt: org.apache.spark.sql.types.DataType): NamedExpression =
      Alias(Literal.create(null, dt), name)()
    // union layout: [lCarry..., __ao_t, __ao_g, __ao_tb_i..., __ao_k_i..., __ao_r]
    val lProj: Seq[NamedExpression] =
      (lCarry: Seq[NamedExpression]) ++
        Seq(Alias(lt, "__ao_t")(), Alias(Literal(1), "__ao_g")()) ++
        ties.zipWithIndex.map { case ((e, _), i) => na(s"__ao_tb_$i", e.dataType) } ++
        keys.zipWithIndex.map { case ((lk, _), i) => Alias(lk, s"__ao_k_$i")() } ++
        Seq(na("__ao_r", rvType))
    val rProj: Seq[NamedExpression] =
      lCarry.map(a => na(a.name, a.dataType)) ++
        Seq(Alias(rt, "__ao_t")(), Alias(Literal(0), "__ao_g")()) ++
        ties.zipWithIndex.map { case ((e, _), i) => Alias(e, s"__ao_tb_$i")() } ++
        keys.zipWithIndex.map { case ((_, rk), i) => Alias(rk, s"__ao_k_$i")() } ++
        Seq(Alias(rvStruct, "__ao_r")())
    val union = Union(Seq(Project(lProj, leftF), Project(rProj, rightF)),
      byName = false, allowMissingCol = false)
    val uOut = union.output
    val nL = lCarry.size
    val tU = uOut(nL); val gU = uOut(nL + 1)
    val tbU = uOut.slice(nL + 2, nL + 2 + ties.size)
    val kU = uOut.slice(nL + 2 + ties.size, nL + 2 + ties.size + keys.size)
    val rU = uOut.last

    val carryType = StructType(Seq(
      StructField("t", rt.dataType, nullable = false),
      StructField("r", rvType, nullable = false)))
    val carry = If(EqualTo(gU, Literal(0)),
      CreateNamedStruct(Seq(Literal("t"), tU, Literal("r"), rU)),
      Literal.create(null, carryType))
    // at equal instants: rights before lefts for r.t <= l.t (g asc,
    // right g=0), after them for the strict r.t < l.t (g desc)
    val order: Seq[SortOrder] =
      SortOrder(tU, Ascending) +:
        SortOrder(gU, if (strict) Descending else Ascending) +:
        ties.zip(tbU).map { case ((_, d), a) => SortOrder(a, d) }
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val wAlias = Alias(WindowExpression(
      Last(carry, ignoreNulls = true).toAggregateExpression(),
      WindowSpecDefinition(kU, order, frame)), "__ao_w")()
    val win = Window(Seq(wAlias), kU, order, union, None)
    val wA = wAlias.toAttribute
    val wT = GetStructField(wA, 0, Some("t"))
    // "the carried right is a real match": non-null and inside every
    // lower bound (e references only lCarry attrs — in scope through
    // the union). Monotone in the carried time, so exact as a
    // post-condition on the single carried row.
    val bestOk: Expression =
      (IsNotNull(wA) +: lowers.toSeq.map { case (e, _, s) =>
        (if (s) GreaterThan(wT, e) else GreaterThanOrEqual(wT, e)): Expression
      }).reduce(And)
    // inner: out-of-window lefts drop; LEFT OUTER: they stay, null-extended
    val filt =
      if (outer) Filter(EqualTo(gU, Literal(1)), win)
      else Filter(And(EqualTo(gU, Literal(1)), bestOk), win)

    // original output, original exprIds: left attrs ride the union
    // bare; right attrs unpack from the carried struct (KnownNotNull
    // restores the static flag the struct detour widened — the value is
    // provably non-null: the struct is built from right rows only and
    // the bestOk filter has already run; for LEFT OUTER the join output
    // already marks right attrs nullable, and the If supplies the null)
    val wR = GetStructField(wA, 1, Some("r"))
    val rIdx = visR.map(_.exprId).zipWithIndex.toMap
    val outProj: Seq[NamedExpression] = w.output.map { a =>
      if (a.exprId == rnAlias.exprId)
        Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
      else if (leftOut.contains(a)) a
      else {
        val i = rIdx(a.exprId)
        val g = GetStructField(wR, i, Some(a.name))
        val v =
          if (outer) If(bestOk, g, Literal.create(null, a.dataType))
          else if (a.nullable) g
          else KnownNotNull(g)
        Alias(v, a.name)(exprId = a.exprId)
      }
    }
    logInfo(s"AsOfJoinRule: rewrote rank-1-over-join as-of " +
      s"(${keys.size} key(s), ${ties.size} tie key(s), " +
      s"${lowers.size} lower bound(s), strict=$strict, outer=$outer)")
    Some(Project(outProj, filt))
  }
}
