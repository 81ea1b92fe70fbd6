package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dsl._

/** Join strategy coverage, one query per Citus join rule
  * (`src/include/distributed/multi_join_order.h:30-47`):
  * REFERENCE_JOIN → broadcast hash join; LOCAL_PARTITION_JOIN /
  * DUAL_PARTITION_JOIN → shuffle joins (Spark inserts the exchanges the
  * reference's MapMergeJob subsystem implements by hand); semi/anti from
  * IN/EXISTS (`query_pushdown_planning.c:650`); CARTESIAN_PRODUCT →
  * crossJoin; plus outer joins with recurring-tuple semantics
  * (`RecurringTuplesType`, query_pushdown_planning.c:52-60).
  */
object JoinQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** REFERENCE_JOIN: small dims broadcast to every task. */
  private val broadcastRef = GraftQuery(
    "join_broadcast_reference",
    (s, dir) =>
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          dsum(money(col("s_acctbal"))).as("total_balance"))
        .orderBy(col("r_name")),
    Some("""SELECT r_name, COUNT(*) AS n_suppliers,
      CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
      FROM supplier, nation, region
      WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** DUAL_PARTITION_JOIN: both big sides shuffled on the join key. */
  private val shuffleJoin = GraftQuery(
    "join_shuffle_large",
    (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus, COUNT(*) AS n_lines,
      CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT)) AS DOUBLE)/10000 AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    bench = true)

  /** DUAL_PARTITION_JOIN, plan-FORCED: the same fact⋈fact join with a
    * SHUFFLE_HASH join hint so the shuffle path is actually TIMED at
    * bench scale. At sf≤1 table stats let `join_shuffle_large` broadcast
    * the orders side (64 MB threshold vs a ~22 MB file), so the bench
    * never exercised the exchange; at 100 TB both sides shuffle and this
    * plan is the dominant cost. A hint (not a config flip) keeps
    * semantics identical and scopes the forcing to this one entry;
    * EXPLAINS.md pins ShuffledHashJoin + two Exchanges for it.
    * r13 optimization (guide §3.1): the hint was MERGE through r12;
    * shuffled-hash keeps both exchanges (the dual-partition shape) but
    * replaces two sorts with one per-partition hash build on the
    * smaller orders side — the reference's own repartition join is a
    * hash join per fragment pair, not a merge. Per-partition build size
    * stays bounded at scale by the 64 MB-per-partition shuffle sizing.
    * Measured r13 (interleaved, same JVM; with the Dsl.cents fix):
    * median 1.14 → 0.84 s, min 0.92 → 0.69 s, value-checked identical.
    * Reference: `multi_join_order.h:41` (DUAL_PARTITION_JOIN),
    * `repartition_join_execution.c:1-24`. */
  private val shuffleFact = GraftQuery(
    "join_shuffle_fact",
    (s, dir) => {
      // project early (guide §2.3): compute the exact cents product
      // map-side so the fact exchange carries (l_orderkey, rev4) — one
      // long instead of two doubles — and the multiply happens before,
      // not after, the repartition. Same sum, integer-exact.
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        (cents(col("l_extendedprice")) *
          oneMinusCents(col("l_discount"))).as("rev4"))
      t(s, dir, "orders").hint("shuffle_hash")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          (sum(col("rev4")).cast("double") / 10000).as("revenue"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_lines,
      CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT)) AS DOUBLE)/10000 AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    bench = true)

  /** LEFT OUTER with a distributed inner side: customers with zero orders
    * kept (COUNT(o_orderkey) ignores the null-extended rows). */
  private val leftOuter = GraftQuery(
    "join_left_outer",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 30000),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_nationkey"))
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          count(col("o_orderkey")).as("n_big_orders"))
        .orderBy(col("c_nationkey")),
    Some("""SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS n_customers,
      COUNT(o_orderkey) AS n_big_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_totalprice > 30000
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Recurring-tuples outer join: the REFERENCE table is the OUTER side
    * of a LEFT JOIN against a distributed aggregate — the case citus
    * guards with RecurringTuplesType (query_pushdown_planning.c:52-60,
    * arbitrary_configs_recurring_outer_join.sql), because a reference
    * table recurring on every shard would duplicate outer rows under
    * naive per-shard execution. Spark plans it as one logical join (the
    * tiny aggregated inner side broadcasts); unmatched nations
    * null-extend exactly once. */
  private val recurringOuter = GraftQuery(
    "join_recurring_outer",
    (s, dir) => {
      val rich = t(s, dir, "customer")
        .filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_rich"))
      t(s, dir, "nation")
        .join(rich, col("n_nationkey") === col("c_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("n_rich"), lit(0L)).as("n_rich"))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey, n_name,
        COALESCE(n_rich, CAST(0 AS BIGINT)) AS n_rich
      FROM nation LEFT JOIN
        (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rich
         FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey) r
        ON n_nationkey = c_nationkey
      ORDER BY n_nationkey"""))

  /** FULL OUTER join of two aggregates (1996 vs 1997 actives). */
  private val fullOuter = GraftQuery(
    "join_full_outer",
    (s, dir) => {
      val ord = t(s, dir, "orders")
      val y96 = ord.filter(year(col("o_orderdate")) === 1996)
        .groupBy(col("o_custkey").as("k96"))
        .agg(count(lit(1)).as("n96"))
      val y97 = ord.filter(year(col("o_orderdate")) === 1997)
        .groupBy(col("o_custkey").as("k97"))
        .agg(count(lit(1)).as("n97"))
      y96.join(y97, col("k96") === col("k97"), "full")
        .select(
          coalesce(col("k96"), col("k97")).as("custkey"),
          coalesce(col("n96"), lit(0L)).as("n96"),
          coalesce(col("n97"), lit(0L)).as("n97"))
        .orderBy(col("custkey"))
    },
    Some("""SELECT COALESCE(k96, k97) AS custkey,
      COALESCE(n96, 0) AS n96, COALESCE(n97, 0) AS n97
      FROM (SELECT o_custkey AS k96, COUNT(*) AS n96 FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1996 GROUP BY 1) a
      FULL OUTER JOIN
           (SELECT o_custkey AS k97, COUNT(*) AS n97 FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1997 GROUP BY 1) b
        ON k96 = k97
      ORDER BY custkey"""))

  /** Semi join (IN/EXISTS pushdown): customers with any urgent order. */
  private val semiJoin = GraftQuery(
    "join_semi",
    (s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Anti join (NOT EXISTS): parts never shipped in bulk (qty > 45). */
  private val antiJoin = GraftQuery(
    "join_anti",
    (s, dir) =>
      t(s, dir, "part")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 45),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_never_bulk"))
        .orderBy(col("p_brand")),
    Some("""SELECT p_brand, COUNT(*) AS n_never_bulk FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
        WHERE l_partkey = p_partkey AND l_quantity > 45)
      GROUP BY p_brand ORDER BY p_brand"""))

  /** CARTESIAN_PRODUCT (crossJoin) between two dims. */
  private val crossJ = GraftQuery(
    "join_cross",
    (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"),
          (col("r_regionkey") === col("n_regionkey")).as("is_home"))
        .orderBy(col("r_name"), col("n_name")),
    Some("""SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
      FROM region CROSS JOIN nation ORDER BY r_name, n_name"""))

  /** Theta join: equi key + range residual (suppliers outranked within
    * their nation). Arbitrary theta predicates are residual filters in
    * the reference (multi_join_order.h notes). */
  private val thetaJoin = GraftQuery(
    "join_theta_range",
    (s, dir) => {
      val s1 = t(s, dir, "supplier").select(
        col("s_suppkey").as("a_key"), col("s_nationkey").as("a_nation"),
        col("s_acctbal").as("a_bal"))
      val s2 = t(s, dir, "supplier").select(
        col("s_suppkey").as("b_key"), col("s_nationkey").as("b_nation"),
        col("s_acctbal").as("b_bal"))
      s1.join(s2, col("a_nation") === col("b_nation") &&
          col("a_bal") < col("b_bal"))
        .groupBy(col("a_nation"))
        .agg(count(lit(1)).as("n_outranked_pairs"))
        .orderBy(col("a_nation"))
    },
    Some("""SELECT a.s_nationkey AS a_nation, COUNT(*) AS n_outranked_pairs
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey AND a.s_acctbal < b.s_acctbal
      GROUP BY a.s_nationkey ORDER BY a_nation"""))

  /** Salted skew join (operators/SkewJoin): the hot-key mitigation for
    * when one join key's rows exceed a reducer (the 100 TB hot-tenant
    * problem; AQE skew-split is the automatic path, salting the manual
    * one). Salting MUST NOT change semantics — the oracle is the plain
    * unsalted join, so the gate proves spread-over-n-reducers ≡ direct
    * join. */
  private val skewSalted = GraftQuery(
    "join_skew_salted",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
        .withColumnRenamed("s_suppkey", "l_suppkey")
      graft.operators.SkewJoin.saltedEquiJoin(li, sup, "l_suppkey", 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          dsum(money(col("l_quantity"))).as("total_qty"))
        .orderBy(col("s_nationkey"))
    },
    Some("""SELECT s_nationkey, COUNT(*) AS n_items,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  override val queries: Seq[GraftQuery] = Seq(
    broadcastRef, shuffleJoin, shuffleFact, leftOuter, recurringOuter,
    fullOuter, semiJoin, antiJoin, crossJ, thetaJoin, skewSalted)
}
