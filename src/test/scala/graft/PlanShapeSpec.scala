package graft

import graft.plans.PlanChecks
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** EXPLAIN-style plan pins for the headline queries (the reference does
  * this with EXPLAIN diffs — multi_explain.sql): broadcasts where dims
  * are small, two-phase aggregation, top-k as TakeOrderedAndProject. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String) = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    PlanChecks.executedPlan(df)
  }

  private def collectAll(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    Seq(p) ++ p.children.flatMap(collectAll) ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    })

  test("q1: two-phase hash aggregation (partial before, final after exchange)") {
    val aggs = collectAll(plan("q1_pricing_summary"))
      .collect { case h: HashAggregateExec => h }
    assert(aggs.size >= 2, "expected partial+final HashAggregate")
  }

  test("q5: dimension joins broadcast (reference-join strategy)") {
    val df = SparkEntry.queries("q5_local_supplier")(spark, TestSpark.sf)
    assert(PlanChecks.hasBroadcastHashJoin(df))
  }

  test("q3: top-k compiles to TakeOrderedAndProject (partial top-k + merge)") {
    val tops = collectAll(plan("q3_shipping_priority"))
      .collect { case t: TakeOrderedAndProjectExec => t }
    assert(tops.nonEmpty,
      "ORDER BY + LIMIT must plan as TakeOrderedAndProject, not global sort")
  }

  test("q6: filters push into the parquet scan") {
    val df = SparkEntry.queries("q6_forecast_revenue")(spark, TestSpark.sf)
    val pushed = PlanChecks.pushedFilters(df)
    assert(pushed.exists(f => f.contains("l_discount") ||
      f.contains("l_quantity") || f.contains("l_shipdate")),
      s"expected pushed filters, got $pushed")
  }
}
