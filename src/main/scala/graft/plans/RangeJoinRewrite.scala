package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a POINT-IN-INTERVAL theta join into a
  * bucketed equi-join — the whole-plan form of
  * [[graft.operators.RangeJoin.bucketedOverlapJoin]], applied
  * AUTOMATICALLY so a user can write the natural
  * {{{ events JOIN intervals ON lo <= pt AND pt < hi }}}
  * and still get the 100 TB plan. Without an equi conjunct Spark has
  * only BroadcastNestedLoopJoin (fine when one side broadcasts) or a
  * cartesian product (never fine); this rule explodes each interval
  * into the width-W buckets it covers, adds `pt DIV W` on the point
  * side, joins hash-on-bucket (plus any original equi keys), and
  * re-applies the exact original predicate above the join. The
  * point's bucket is unique and appears exactly once in the
  * interval's bucket sequence, so no dedup step is needed (contrast
  * the interval×interval operator form, which must credit one shared
  * bucket).
  *
  * OPT-IN: active only when `spark.graft.rangeJoin.binSize` is a
  * positive long — bin width is a data statement (interval scale)
  * the engine must not guess, and when the small side fits a
  * broadcast the BNLJ it replaces is already optimal. Scope: INNER
  * joins, integral-typed bounds (the engine's event-time joins are
  * epoch integers), bounds from one side + point from the other,
  * any mix of strict/non-strict inequalities. Inverted intervals
  * (lo > hi) are pre-filtered — they cannot satisfy the original
  * predicate, and an unguarded descending `sequence()` would
  * fabricate buckets for them.
  *
  * Registered via [[graft.functions.GraftExtensions]] (builder
  * `withExtensions` → `injectOptimizerRule`) or on a live session
  * through `experimentalMethods.extraOptimizations`
  * (`GraftExtensions.installInto`). The rule is idempotent: the
  * rewritten join's condition carries only equalities, which the
  * pattern cannot re-match.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  final val BinSizeKey = "spark.graft.rangeJoin.binSize"

  private case class PointBound(lo: Expression, pt: Expression,
                                hi: Expression)

  /** Canonicalize `a ≤ b` / `a < b` / reversed forms to (small, big). */
  private def asBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = SQLConf.get.getConfString(BinSizeKey, "0").toLong
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        rewrite(j, l, r, cond, hint, w).getOrElse(j)
    }
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromLeft(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(l.outputSet)
    def fromRight(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(r.outputSet)
    def oneSided(e: Expression): Boolean = fromLeft(e) || fromRight(e)

    // already an equi-join on some key? Catalyst handles it; the rule
    // targets joins whose ONLY cross-side links are the inequalities
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case EqualNullSafe(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case _ => false
    }
    if (hasEqui) return None

    val bounds = conjuncts.flatMap(asBound)
    // find lo ≤ PT and PT ≤ hi with pt one side, lo/hi the other
    val hit = bounds.iterator.flatMap { case (lo, pt1) =>
      bounds.collectFirst {
        case (pt2, hi) if pt1.semanticEquals(pt2) &&
          oneSided(pt1) && oneSided(lo) && oneSided(hi) &&
          (fromLeft(pt1) != fromLeft(lo)) &&
          (fromLeft(lo) == fromLeft(hi)) &&
          integral(pt1) && integral(lo) && integral(hi) =>
          PointBound(lo, pt1, hi)
      }
    }.take(1).toList.headOption
    hit.flatMap { case PointBound(lo, pt, hi) =>
      val ptOnLeft = fromLeft(pt)
      val ptSide = if (ptOnLeft) l else r
      val ivSide = if (ptOnLeft) r else l

      def bucketOf(e: Expression): Expression =
        Cast(Floor(Divide(Cast(e, DoubleType),
          Literal(w.toDouble))), LongType)

      // interval side: drop can't-match inverted intervals, then
      // explode the covered bucket range
      val ivBkt = AttributeReference("_graft_bkt", LongType,
        nullable = false)()
      val ivFiltered = Filter(LessThanOrEqual(
        Cast(lo, LongType), Cast(hi, LongType)), ivSide)
      // Sequence is TimeZoneAware: without an explicit zone it stays
      // unresolved, and nothing re-resolves optimizer output
      val ivExploded = Generate(
        Explode(Sequence(bucketOf(lo), bucketOf(hi),
          Some(Literal(1L)), Some(SQLConf.get.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ivBkt), child = ivFiltered)

      // point side: project the point's bucket alongside
      val ptBktAlias = Alias(bucketOf(pt), "_graft_pt_bkt")()
      val ptProjected = Project(ptSide.output :+ ptBktAlias, ptSide)

      val bucketEq = EqualTo(ivBkt, ptBktAlias.toAttribute)
      val (newL, newR) =
        if (ptOnLeft) (ptProjected, ivExploded)
        else (ivExploded, ptProjected)
      val newJoin = Join(newL, newR, Inner, Some(bucketEq), hint)
      // the exact original predicate re-applies above the join; the
      // final project restores the original output (pruning the
      // bucket columns)
      Some(Project(j.output, Filter(cond, newJoin)))
    }
  }
}
