package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** LIMIT approximation — the reference's
  * `citus.limit_clause_row_fetch_count` GUC (`shared_library_init.c:1853`,
  * `CanPushDownLimitApproximate` `multi_logical_optimizer.c:5222`): for a
  * grouped query with a LIMIT, each worker fetches only N input rows
  * instead of aggregating its full shard, trading exactness for a bounded
  * per-shard read. Spark-side: inject `LocalLimit(N)` (a per-partition
  * limit — no shuffle, no coordination) below the Aggregate feeding a
  * GlobalLimit.
  *
  * Opt-in, like the GUC: set `spark.graft.limitApproxRowFetchCount` to a
  * positive row count; 0 (default) disables. Results are approximate by
  * design — this is for "top slice of a huge grouped result is enough"
  * interactive queries.
  */
object ApproximateLimit extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.limitApproxRowFetchCount"

  /** Descend through limit-transparent nodes to the first Aggregate and
    * bound its input per-partition (idempotent). */
  private def inject(p: LogicalPlan, n: Long): LogicalPlan = p match {
    case s: Sort => s.copy(child = inject(s.child, n))
    case pr: Project => pr.copy(child = inject(pr.child, n))
    case a: Aggregate if !a.child.isInstanceOf[LocalLimit] =>
      a.copy(child = LocalLimit(Literal(n.toInt), a.child))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val n = conf.getConfString(ConfKey, "0").toLong
    if (n <= 0) plan
    else plan.transform {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, child)) =>
        val injected = inject(child, n)
        if (injected eq child) gl
        else gl.copy(child = ll.copy(child = injected))
    }
  }
}
