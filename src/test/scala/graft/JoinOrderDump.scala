package graft

import graft.sql.PgDialect

/** Dev tool: print the post-AQE executed plans for the join-order
  * battery (`multi_join_order_additional.sql`) so EXPLAINS.md can
  * document where AQE's join order differs from the reference's greedy
  * left-deep order (`planner/multi_join_order.c:286`) and why the
  * resulting plan is equal or better. */
object JoinOrderDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    Tables.registerAll(spark, TestSpark.sf)
    Seq("lineitem_hash" -> "lineitem", "orders_hash" -> "orders",
      "customer_hash" -> "customer", "customer_append" -> "customer")
      .foreach { case (a, t) =>
        spark.table(t).createOrReplaceTempView(a) }
    val queries = Seq(
      "self-join on the distribution key" ->
        """SELECT l1.l_quantity FROM lineitem l1, lineitem l2
           WHERE l1.l_orderkey = l2.l_orderkey AND l1.l_quantity > 5""",
      "factorizable OR join clause" ->
        """SELECT count(*) FROM lineitem, orders
           WHERE (l_orderkey = o_orderkey AND l_quantity > 5)
           OR (l_orderkey = o_orderkey AND l_quantity < 10)""",
      "non-factorizable OR -> cartesian residual" ->
        """SELECT l_quantity FROM lineitem, orders
           WHERE (l_orderkey = o_orderkey OR l_quantity > 5)""",
      "broadcast join with hash-partitioned table" ->
        """SELECT count(*) FROM customer_hash, nation
           WHERE c_nationkey = n_nationkey""",
      "dual-repartition chain (o_custkey = l_partkey = c_nationkey)" ->
        """SELECT count(*) FROM orders, lineitem, customer_append
           WHERE o_custkey = l_partkey AND o_custkey = c_nationkey""")
    queries.foreach { case (label, q) =>
      val df = PgDialect.sql(spark, q)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $label")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(150)).mkString("\n"))
    }
  }
}
