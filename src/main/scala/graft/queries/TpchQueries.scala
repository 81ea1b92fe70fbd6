package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dsl._

/** TPC-H-derived correctness corpus, adapted to the driver's synthetic
  * star schema (TESTDATA.md — no partsupp, no l_shipmode/l_commitdate).
  *
  * Mirrors the reference's TPC-H regression corpus
  * (citus `src/test/regress/sql/multi_tpch_query1.sql` .. `query19.sql`):
  * the reference pushes per-shard SQL to PostgreSQL and combines on the
  * coordinator (`multi_logical_optimizer.c:1427,2394`); here the same
  * partial/final aggregation split is Spark's native HashAggregate
  * partial → final, and the joins below exercise each Citus join rule
  * (`multi_join_order.h:30-47`): broadcast (reference join), shuffle
  * (dual partition join), and semi-join (subquery pushdown).
  *
  * Money math uses the Dsl fixed-point cents path: exact (bit-identical
  * with the DuckDB oracle) and primitive-typed so the hash aggregates
  * stay in whole-stage codegen — these are the headline bench queries.
  */
object TpchQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Q1: scan → filter → 2-phase agg → sort. multi_tpch_query1.sql */
  private val q1 = GraftQuery(
    "q1_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          revSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          chargeSum(col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .as("sum_charge"),
          moneyAvg(col("l_quantity")).as("avg_qty"),
          moneyAvg(col("l_extendedprice")).as("avg_price"),
          moneyAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
      CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
      CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT)) AS DOUBLE)/10000 AS sum_disc_price,
      CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT) * CAST(round((1+l_tax)*100,0) AS BIGINT)) AS DOUBLE)/1000000 AS sum_charge,
      CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100/COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100/COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)/100/COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  private val revOracle =
    """CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT)) AS DOUBLE)/10000"""

  /** Q3: 3-way join + agg + top-k. multi_tpch_query3.sql */
  private val q3 = GraftQuery(
    "q3_shipping_priority",
    (s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < ts("1997-03-15"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1997-03-15"))
      // Fact-driven: lineitem (unbroadcastable) anchors; the filtered
      // orders/customer sides broadcast under bench stats, shuffle-join
      // at scale — see q5.
      li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, $revOracle AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1997-03-15'
        AND l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    bench = true)

  /** Q4-style: EXISTS → left-semi join with a non-equi residual. */
  private val q4 = GraftQuery(
    "q4_order_priority",
    (s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
      val li = t(s, dir, "lineitem")
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Q5: 6-way join (region/nation broadcast, rest shuffle). */
  private val q5 = GraftQuery(
    "q5_local_supplier",
    (s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val li = t(s, dir, "lineitem")
      val supp = t(s, dir, "supplier")
      // Fact-driven join order: lineitem is the one table that can never
      // be broadcast, so it anchors the plan and every other side joins
      // INTO it. Only the genuinely bounded tables (nation 25 rows,
      // region 5) carry a broadcast hint; orders/customer/supplier are
      // left to the planner — under the bench's stats they broadcast
      // (single all-BHJ stage, no orderkey shuffle), at 100 TB they fall
      // back to shuffle joins on the colocated bucketed layout.
      li
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name, $revOracle AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""),
    bench = true)

  /** Q6: selective scan + scalar agg. multi_tpch_query6.sql */
  private val q6 = GraftQuery(
    "q6_forecast_revenue",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .cast("double") / 10000).as("revenue")),
    Some("""SELECT CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)/10000 AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""),
    bench = true)

  /** Q7: cross-nation volume shipping; two aliases of one dim table. */
  private val q7 = GraftQuery(
    "q7_volume_shipping",
    (s, dir) => {
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
      t(s, dir, "supplier")
        .join(li, col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("supp_nation"), col("cust_nation"),
          col("l_year"))
        .limit(20)
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
      $revOracle AS revenue
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND n1.n_name < n2.n_name
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY revenue DESC, supp_nation, cust_nation, l_year LIMIT 20"""),
    bench = true)

  /** Q10: returned items; join + agg + top-20. multi_tpch_query10.sql */
  private val q10 = GraftQuery(
    "q10_returned_item",
    (s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-10-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revOracle AS revenue
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    bench = true)

  /** Q12-style: conditional two-way counts (no l_shipmode in the data —
    * grouped by l_linestatus, counting urgent vs non-urgent orders). */
  private val q12 = GraftQuery(
    "q12_priority_shipping",
    (s, dir) => {
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
      li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    // NB: DuckDB SUM(INTEGER) yields HUGEINT (int128) which pandas
    // surfaces as float64 — cast to BIGINT so the driver's value hash
    // matches Spark's LongType sums bit-for-bit.
    Some("""SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Q14: promo revenue percentage (conditional agg ratio). */
  private val q14 = GraftQuery(
    "q14_promo_revenue",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01") &&
          col("l_shipdate") < ts("1996-10-01"))
      val rev4 = cents(col("l_extendedprice")) * oneMinusCents(col("l_discount"))
      li.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev4).otherwise(0L))
            .cast("double") /
          sum(rev4).cast("double")).as("promo_revenue"))
    },
    Some("""SELECT 100.0 *
        CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT)
          ELSE 0 END) AS DOUBLE) /
        CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT)) AS DOUBLE)
        AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01'"""),
    bench = true)

  /** Q18: large-volume customers — agg subquery feeding a semi join. */
  private val q18 = GraftQuery(
    "q18_large_volume_customer",
    (s, dir) => {
      // Single lineitem pass: the per-order quantity aggregate both
      // filters (HAVING > 150) and provides sum_qty — no second scan or
      // re-aggregation (the reference would run this as one worker
      // query per shard too).
      val big = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_quantity"))).as("qc"))
        .filter(col("qc") > 15000)
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          (col("qc").cast("double") / 100).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_qty
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(round(l_quantity*100,0) AS BIGINT)) > 15000)
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""),
    bench = true)

  /** Q19: OR-of-ANDs pushdown (brand/size/qty bands). */
  private val q19 = GraftQuery(
    "q19_discounted_revenue",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#5" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 40)))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
    },
    Some(s"""SELECT $revOracle AS revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND (
        (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20) OR
        (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30) OR
        (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 40))"""),
    bench = true)

  override val queries: Seq[GraftQuery] =
    Seq(q1, q3, q4, q5, q6, q7, q10, q12, q14, q18, q19)
}
