package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule turning a pure interval-overlap theta join into a
  * binned equi join — the rewrite that gives `a.start < b.end AND
  * b.start < a.end` a 100 TB execution shape.
  *
  * Spark's planner has no equi key to hash or sort on for such a
  * condition, so it falls back to BroadcastNestedLoopJoin — O(|L|·|R|)
  * predicate evaluations and a broadcast requirement on one whole
  * side. The standard fix (the same idea as ops/Relational.
  * rangeJoinBinned, here applied AUTOMATICALLY by the optimizer) is to
  * quantize the value domain into fixed-width bins, explode each row
  * to the bins its interval touches, and join on bin equality; the
  * original predicate is kept as a residual filter, and each
  * qualifying pair is emitted in EXACTLY one bin — the one containing
  * `greatest(l.lower, r.lower)` — so no dedup pass is needed.
  *
  * Cover proof (why no qualifying pair can be missed, for ANY longs,
  * even "intervals" whose bounds arrive inverted): each side explodes
  * to `[floorDiv(least(a, d)), floorDiv(greatest(a, d))]`. The anchor
  * is `g = greatest(la, rc)`. If `g = la`: `la` lies between the left
  * side's own least/greatest trivially, and the condition `la < rb`
  * plus `g ≥ rc` sandwich it inside the right side's bin span. The
  * `g = rc` case is symmetric via `rc < ld`. Bin arithmetic is FLOOR
  * division (`(e − pmod(e, w)) / w`), exact for negative bounds where
  * truncating division would misplace the bin.
  *
  * Scope — the rule fires only on the would-be-nested-loop case:
  * an INNER batch join whose condition is EXACTLY two strict/non-strict
  * comparisons in opposite directions between single-side LongType
  * expressions, with no other conjuncts. A join that also carries an
  * equality conjunct already has a hash/sort shape and is left alone.
  * Gated by `spark.graft.rangeJoin.binWidth` (rows explode to
  * span/width + 1 bin copies — width should sit near the TYPICAL span;
  * 0 disables). Overlap joins where one side is a broadcast-size
  * dimension lose nothing: the rewrite's equi join broadcasts the same
  * frame.
  *
  * Reference anchor: the interval-overlap family of SURVEY §2 J7/J8
  * (zetadex-rewards-v2-pipeline epoch containment; mm-uptime interval
  * coverage) — there expressed with manual binning, here recognized on
  * the plain declarative predicate.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WIDTH_KEY = "spark.graft.rangeJoin.binWidth"

  private def width: Long =
    conf.getConfString(WIDTH_KEY, "0").toLong

  /** A conjunct `lower < upper` (or ≤) whose operands are LongType and
    * reference exactly one join side each. */
  private final case class Cmp(lower: Expression, upper: Expression)

  private def asCmp(e: Expression, left: LogicalPlan,
                    right: LogicalPlan): Option[(Cmp, Boolean)] = {
    def sided(x: Expression): Option[Boolean] =
      if (x.dataType != LongType || !x.deterministic) None
      else if (x.references.nonEmpty &&
        x.references.subsetOf(left.outputSet)) Some(true)
      else if (x.references.nonEmpty &&
        x.references.subsetOf(right.outputSet)) Some(false)
      else None
    val (lo, hi) = e match {
      case LessThan(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b) => (b, a)
      case GreaterThanOrEqual(a, b) => (b, a)
      case _ => return None
    }
    (sided(lo), sided(hi)) match {
      // (comparison, true when the LOWER operand is from the left side)
      case (Some(true), Some(false)) => Some((Cmp(lo, hi), true))
      case (Some(false), Some(true)) => Some((Cmp(lo, hi), false))
      case _ => None
    }
  }

  private def floorDiv(e: Expression, w: Long): Expression =
    IntegralDivide(Subtract(e, Pmod(e, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !left.isStreaming && !right.isStreaming =>
        splitConjunctivePredicates(cond) match {
          case Seq(c1, c2) =>
            (asCmp(c1, left, right), asCmp(c2, left, right)) match {
              // opposite directions: one "left-bound below right-bound"
              // and one "right-bound below left-bound" — the overlap
              // shape l.start < r.end AND r.start < l.end
              case (Some((a, da)), Some((b, db))) if da != db =>
                val (lCmp, rCmp) = if (da) (a, b) else (b, a)
                // left interval bounds: lower from lCmp (left side),
                // upper from rCmp (the left operand is its upper)
                val (la, ld) = (lCmp.lower, rCmp.upper)
                val (rc, rb) = (rCmp.lower, lCmp.upper)
                def explodeBins(side: LogicalPlan, x: Expression,
                                y: Expression, name: String) = {
                  // Sequence is TimeZoneAwareExpression: without an
                  // explicit zone it is UNRESOLVED and the optimizer
                  // rejects the rewritten plan (long sequences never
                  // use it, but resolution requires it regardless)
                  val bins = Sequence(
                    floorDiv(Least(Seq(x, y)), w),
                    floorDiv(Greatest(Seq(x, y)), w),
                    Some(Literal(1L)),
                    Some(conf.sessionLocalTimeZone))
                  val attr = AttributeReference(name, LongType,
                    nullable = false)()
                  (Generate(Explode(bins), Nil, outer = false, None,
                    Seq(attr), side), attr)
                }
                val (lGen, lBin) = explodeBins(left, la, ld, "__graft_bin_l")
                val (rGen, rBin) = explodeBins(right, rc, rb, "__graft_bin_r")
                val anchor = floorDiv(Greatest(Seq(la, rc)), w)
                val newCond = And(And(
                  EqualTo(lBin, rBin), EqualTo(lBin, anchor)), cond)
                Project(j.output,
                  Join(lGen, rGen, Inner, Some(newCond), hint))
              case _ => j
            }
          case _ => j
        }
    }
  }
}
