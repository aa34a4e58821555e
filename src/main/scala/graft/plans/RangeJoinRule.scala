package graft.plans

import graft.functions.{IntervalBucket, IntervalReportBucket}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Logical rewrite for SQL interval-overlap range joins — the temporal twin
 * of [[SpatialJoinRule]], and the declarative form of
 * [[graft.operators.TemporalJoin.overlaps]] (the bin-based range-join
 * optimization production engines expose for exactly this θ-shape). A
 * pure-SQL
 *
 * {{{ SELECT ... FROM l JOIN r ON l.s <= r.e AND r.s <= l.e }}}
 *
 * plans as a nested-loop (O(|l|·|r|)); with
 * `spark.graft.join.timeBucket = B` (> 0 enables the rule; the bucket is
 * workload knowledge — choose it near the typical interval length, the
 * same contract the operator API documents) the join becomes
 *
 * {{{
 *   Project(original output,
 *     Join(Generate(explode(sequence(bucket(least(ls,le)), bucket(greatest(ls,le)))), l),
 *          Generate(explode(sequence(bucket(least(rs,re)), bucket(greatest(rs,re)))), r),
 *          Inner, __tb_l = __tb_r AND <original inequalities> AND
 *                 st_t_ref_bucket(ls, rs, B, __tb_l) AND <rest>))
 * }}}
 *
 * — a hash-joinable equality on the bucket id, the exact inequalities as
 * the refine, and the max-start report rule (a pair is emitted only from
 * the bucket holding max(ls, rs), the first instant the intervals
 * coexist) so each overlapping pair appears EXACTLY once with no distinct
 * shuffle. Replication is least→greatest per row (well-defined even for
 * inverted intervals, which the original θ-condition admits), covering:
 * for any satisfying pair, max(ls, rs) lies inside both span hulls, so
 * its bucket is generated on both sides. Strict (<) and non-strict (<=)
 * inequalities both rewrite — the originals are carried verbatim, so the
 * refine preserves their exact semantics.
 *
 * Point-in-interval (`p BETWEEN s AND e`) is the degenerate instance —
 * the pair resolves with ls = le = p, so the point side explodes exactly
 * ONE bucket per row (spec-pinned). The rule only fires on integral
 * (int/long) bounds whose conjunct pair resolves to opposite join sides,
 * skips broadcast-hinted joins (the user asked for the nested-loop
 * plan), and is idempotent — the st_t_ref_bucket conjunct is produced
 * only by this rewrite (structural marker, the [[SpatialJoinRule]]
 * convention).
 *
 * AMBIGUITY GUARD (load-bearing — found by a real OOM): the condition
 * may carry OTHER crossing integral inequalities (the classic
 * `id_a < id_b` pair-dedup filter, pushed into the join condition by
 * the optimizer), and the overlap decomposition cannot statically tell
 * bounds from ids — a mis-pick explodes sequence() over an id-to-epoch
 * span (measured: ~14M buckets PER ROW, an executor OOM). When more
 * than one candidate pair matches, the rule conservatively DECLINES
 * (logged): restate auxiliary filters in non-inequality form
 * (`least(id_a, id_b) = id_a AND id_a <> id_b`), pre-filter a side, or
 * — the r13 off-ramp — name the bound columns in
 * `spark.graft.join.timeCols` (comma-separated, case-insensitive): a
 * candidate pair then qualifies only if EVERY one of its four bound
 * expressions references a named column, which (a) disambiguates the
 * pushed-id case (the id pair references no time column — the rewrite
 * fires on the real bounds), and (b) protects OTHER single-pair joins
 * in the same session (a price/score band join references no time
 * column — not rewritten, its own sequence() explosion never built).
 *
 * RUNTIME SPAN CAP (defense in depth): whatever static analysis
 * concludes, the generated per-row bucket range is bounded by
 * `spark.graft.join.timeBucketMaxSpan` (default 4096 buckets/row) — a
 * row whose span/bucket ratio exceeds the cap raises a loud, actionable
 * error instead of letting sequence() allocate toward the same class of
 * executor OOM. The operator API keeps its own contract (bucket ≈
 * typical interval length ⇒ O(1) replication); the cap only converts
 * the silent failure mode of a mis-configured bucket into a message.
 */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** A malformed conf value must disable the rule with a warning, not
    * throw NumberFormatException inside the optimizer (which would fail
    * EVERY query in the session with an opaque error). */
  private def bucket: Long = {
    val raw = conf.getConfString("spark.graft.join.timeBucket", "0")
    raw.toLongOption.getOrElse {
      logWarning(s"RangeJoinRule: unparsable spark.graft.join.timeBucket " +
        s"'$raw' — treating as 0 (rewrite disabled)")
      0L
    }
  }

  private def broadcastHinted(hint: JoinHint): Boolean =
    (hint.leftHint ++ hint.rightHint).exists(_.strategy.contains(BROADCAST))

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Bound-column hints: lowercased names from spark.graft.join.timeCols. */
  private def timeCols: Set[String] =
    conf.getConfString("spark.graft.join.timeCols", "")
      .split(',').map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

  private def maxSpan: Long = {
    val raw = conf.getConfString("spark.graft.join.timeBucketMaxSpan", "4096")
    raw.toLongOption.filter(_ > 0).getOrElse {
      logWarning(s"RangeJoinRule: unparsable spark.graft.join.timeBucketMaxSpan " +
        s"'$raw' — using 4096")
      4096L
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val b = bucket
    if (b <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if !broadcastHinted(hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val alreadyRewritten = conjuncts.exists {
          case _: IntervalReportBucket => true
          case _ => false
        }
        // normalize every inequality conjunct to (lo <=/< hi, index)
        val ineqs = conjuncts.zipWithIndex.flatMap {
          case (LessThanOrEqual(a, c), i) => Seq((a, c, i))
          case (LessThan(a, c), i) => Seq((a, c, i))
          case (GreaterThanOrEqual(a, c), i) => Seq((c, a, i))
          case (GreaterThan(a, c), i) => Seq((c, a, i))
          case _ => Nil
        }.filter { case (a, c, _) =>
          integral(a) && integral(c) && a.deterministic && c.deterministic &&
            a.references.nonEmpty && c.references.nonEmpty
        }
        // the overlap shape: one conjunct bounds a LEFT expr by a RIGHT
        // expr, the other a RIGHT expr by a LEFT expr
        val candidates = for {
          (ls, re, i) <- ineqs
          (rs, le, k) <- ineqs if k != i
          if ls.references.subsetOf(left.outputSet) &&
            re.references.subsetOf(right.outputSet) &&
            rs.references.subsetOf(right.outputSet) &&
            le.references.subsetOf(left.outputSet)
        } yield (ls, le, rs, re)
        // timeCols hint: keep only candidates whose four bound exprs all
        // touch a named column — disambiguates pushed auxiliary
        // inequalities AND protects non-temporal joins in the session
        val hinted = timeCols
        def temporal(c: (Expression, Expression, Expression, Expression)) =
          Seq(c._1, c._2, c._3, c._4).forall(
            _.references.exists(a => hinted.contains(a.name.toLowerCase)))
        val eligible =
          if (hinted.isEmpty) candidates else candidates.filter(temporal)
        if (eligible.size > 1 && !alreadyRewritten) {
          logWarning("RangeJoinRule: join condition admits " +
            s"${eligible.size} interval decompositions — declining the " +
            "rewrite (restate auxiliary inequality filters, e.g. " +
            "least(a,b) = a AND a <> b instead of a < b, or name the " +
            "bound columns in spark.graft.join.timeCols)")
        }
        if (eligible.size != 1 || alreadyRewritten) j
        else {
          val (ls, le, rs, re) = eligible.head
          val bLit = Literal(b)
          val cap = maxSpan
          val tz = Some(conf.sessionLocalTimeZone)
          // runtime span cap: a row exploding more than `cap` buckets
          // raises an actionable error instead of allocating toward an
          // executor OOM (the r12 failure class)
          def buckets(lo: Expression, hi: Expression): Generator = {
            val bLo = IntervalBucket(Least(Seq(asLong(lo), asLong(hi))), bLit)
            val bHi = IntervalBucket(Greatest(Seq(asLong(lo), asLong(hi))), bLit)
            val bHiCapped = If(
              GreaterThan(Subtract(bHi, bLo), Literal(cap)),
              Cast(RaiseError(Literal(
                s"RangeJoinRule: a row spans more than $cap time buckets at " +
                s"bucket=$b (spark.graft.join.timeBucket) — raise the bucket, " +
                "pre-filter outlier intervals, or raise " +
                "spark.graft.join.timeBucketMaxSpan")), LongType),
              bHi)
            Explode(Sequence(bLo, bHiCapped, None, tz))
          }
          val cellL = AttributeReference("__tb_l", LongType, nullable = false)()
          val cellR = AttributeReference("__tb_r", LongType, nullable = false)()
          val genL = Generate(buckets(ls, le), Nil, outer = false,
            qualifier = None, generatorOutput = Seq(cellL), child = left)
          val genR = Generate(buckets(rs, re), Nil, outer = false,
            qualifier = None, generatorOutput = Seq(cellR), child = right)
          val newCond = (EqualTo(cellL, cellR) +:
            IntervalReportBucket(asLong(ls), asLong(rs), bLit, cellL) +:
            conjuncts).reduce(And)
          Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
        }
    }
  }
}
