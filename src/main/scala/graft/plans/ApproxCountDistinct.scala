package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** count(DISTINCT) approximation — the reference's
  * `citus.count_distinct_error_rate` GUC (`shared_library_init.c:1141`,
  * rewrite at `multi_logical_optimizer.c:1756-1806`): when the GUC is
  * >0, an exact `count(DISTINCT x)` is planned as
  * `hll_cardinality(hll_union_agg(hll_add_agg(hll_hash(x))))` — a
  * single-pass mergeable sketch instead of the exact two-stage distinct.
  *
  * Spark-side: rewrite the distinct Count aggregate to
  * HyperLogLogPlusPlus (the engine behind `approx_count_distinct`) with
  * the configured relative standard deviation. At 100 TB this turns the
  * expensive distinct expansion (shuffle of every distinct value) into a
  * fixed-size sketch merged per partition — exactly the trade the GUC
  * exists to make.
  *
  * Opt-in, like the GUC: set `spark.graft.countDistinctErrorRate` to a
  * rate in (0, 1); 0 (default) keeps exact semantics. Multi-argument
  * `count(DISTINCT a, b)` stays exact (the reference errors on it in
  * approximate mode; we degrade gracefully instead).
  */
object ApproxCountDistinct extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.countDistinctErrorRate"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rate = conf.getConfString(ConfKey, "0").toDouble
    if (rate <= 0d) plan
    else plan.transform {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
            AggregateExpression(
              HyperLogLogPlusPlus(child, rate), Complete, isDistinct = false,
              filter = ae.filter)
        }
    }
  }
}
