package graft

import graft.plans.QueryStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** citus_stat_statements analogue: same statement shape with different
  * literals collapses to one queryid; distinct shapes get their own
  * rows; reset empties the view. */
class QueryStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The listener fires on the async listener bus — poll briefly. */
  private def eventually[A](f: => A): A = {
    var last: Throwable = null
    val deadline = System.nanoTime() + 10e9.toLong
    while (System.nanoTime() < deadline) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }

  test("same query shape with different literals shares one queryid; " +
      "calls and time accumulate (citus_stat_statements)") {
    QueryStats.reset()
    QueryStats.install(spark)
    val li = Tables(spark, TestSpark.sf, "lineitem")
    // two runs, different literals -> one statement row
    li.filter(col("l_quantity") > 10).agg(count(lit(1))).collect()
    li.filter(col("l_quantity") > 40).agg(count(lit(1))).collect()
    // a different shape -> its own row
    li.groupBy("l_returnflag").count().collect()
    eventually {
      val rows = QueryStats.view(spark).collect()
      val byCalls = rows.map(r => r.getLong(2))
      assert(byCalls.exists(_ >= 2),
        s"expected a statement with >=2 calls, got ${byCalls.toSeq}")
      assert(rows.length >= 2, "expected at least two distinct shapes")
      assert(rows.forall(_.getDouble(3) > 0), "total_time_ms must be > 0")
    }
    QueryStats.reset()
    assert(QueryStats.view(spark).count() === 0)
    QueryStats.uninstall(spark)
  }
}
