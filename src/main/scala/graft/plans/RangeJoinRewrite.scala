package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite an inner join whose only cross-side
  * predicates are an interval containment (`S <= P AND P < E`, point
  * `P` on one side, bounds on the other, timestamp-typed) into the
  * binned equi join of [[graft.operators.RangeJoin]] — automatically.
  *
  * Without an equi predicate Catalyst plans such a join as a
  * BroadcastNestedLoopJoin (quadratic, and an OOM broadcast at scale).
  * With this rule the plan becomes: point side projects a bucket id
  * `floor(sec(P)/W)`; interval side explodes the covering bucket ids
  * `sequence(floor(sec(S)/W), floor(sec(E)/W))`; ONE hash join on the
  * bucket id; the original condition stays as a residual filter, so
  * the rewrite is correctness-transparent (no match lost — a contained
  * point's bucket is within its interval's bucket range; none invented
  * — the residual re-checks containment; none duplicated — each pair
  * meets in exactly one bucket, the point's own).
  *
  * Opt-in like the engine's other GUC analogues: set
  * `spark.graft.rangeJoinBucketSeconds` to the bucket width (pick it
  * near the median interval length so interval replication is O(1));
  * 0 (default) disables. Applies only when no cross-side equi
  * predicate exists (otherwise Spark already hash-joins), and assumes
  * post-1970 timestamps (integral division = floor for positives).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoinBucketSeconds"

  /** A comparison normalized to lower (≤ or <) upper. */
  private case class Bound(lower: Expression, upper: Expression)

  private def spansBoth(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean = {
    def on(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    (on(a, left) && on(b, right)) || (on(a, right) && on(b, left))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "0").toLong
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasCrossEqui = conjuncts.exists {
          case EqualTo(a, b) => spansBoth(a, b, left, right)
          case EqualNullSafe(a, b) => spansBoth(a, b, left, right)
          case _ => false
        }
        if (hasCrossEqui) j
        else {
          val bounds = conjuncts.flatMap {
            case GreaterThanOrEqual(a, b) => Some(Bound(b, a))
            case GreaterThan(a, b)        => Some(Bound(b, a))
            case LessThan(a, b)           => Some(Bound(a, b))
            case LessThanOrEqual(a, b)    => Some(Bound(a, b))
            case _                        => None
          }
          rewrite(j, bounds, w, pointOnLeft = true)
            .orElse(rewrite(j, bounds, w, pointOnLeft = false))
            .getOrElse(j)
        }
    }
  }

  private def rewrite(j: Join, bounds: Seq[Bound], w: Long,
      pointOnLeft: Boolean): Option[LogicalPlan] = {
    val (pSide, iSide) = if (pointOnLeft) (j.left, j.right)
                         else (j.right, j.left)
    def onP(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(pSide.outputSet)
    def onI(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(iSide.outputSet)
    // S <= P  (lower on interval side, upper = the point)
    val startBound = bounds.find(b => onI(b.lower) && onP(b.upper) &&
      b.upper.dataType == TimestampType)
    startBound.flatMap { sb =>
      // P < E  (same point as lower, upper on interval side)
      bounds.find(b => onI(b.upper) && b.lower.semanticEquals(sb.upper))
        .map { eb =>
          val tz = Some(conf.sessionLocalTimeZone)
          def bucket(e: Expression) =
            new IntegralDivide(Cast(e, LongType, tz), Literal(w))
          val pb = Alias(bucket(sb.upper), "__graft_pb")()
          val pProj = Project(pSide.output :+ pb, pSide)
          val gen = Explode(Sequence(
            bucket(sb.lower), bucket(eb.upper), None, tz))
          val genOut = DataTypeUtils.toAttributes(gen.elementSchema)
          val iGen = Generate(gen, Nil, outer = false, None, genOut, iSide)
          val eq = EqualTo(pb.toAttribute, genOut.head)
          val (nl, nr) = if (pointOnLeft) (pProj, iGen) else (iGen, pProj)
          // the original condition survives verbatim as a residual
          // filter; Project restores the join's exact output
          Project(j.output,
            Filter(j.condition.get, Join(nl, nr, Inner, Some(eq), j.hint)))
        }
    }
  }
}
