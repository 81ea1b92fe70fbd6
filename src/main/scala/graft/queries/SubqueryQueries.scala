package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery & CTE corpus (reference: `planner/recursive_planning.c`,
  * `cte_inline.c`, `query_pushdown_planning.c:979-1099`). The reference
  * executes non-pushdownable subqueries separately and broadcasts them as
  * intermediate results; Catalyst plans the whole tree as one DAG and
  * natively decorrelates correlated subqueries the reference errors on —
  * these queries pin that exceeded surface. Implemented via spark.sql on
  * registered views (the engine's SQL front door).
  */
object SubqueryQueries extends QueryModule {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(q)
    }

  /** Uncorrelated scalar subquery in WHERE. */
  private val scalarSub = GraftQuery(
    "subquery_scalar",
    sql("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) * 1.5
        FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) * 1.5
        FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Correlated scalar subquery — Catalyst decorrelates
    * (RewriteCorrelatedScalarSubquery); reference would ERROR unless
    * colocated (query_pushdown_planning.c:1021-1035). */
  private val correlated = GraftQuery(
    "subquery_correlated_scalar",
    sql("""SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (
        SELECT COALESCE(
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
            / COUNT(*) / 15.0, 1e9)
        FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""),
    Some("""SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (
        SELECT COALESCE(
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
            / COUNT(*) / 15.0, 1e9)
        FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** IN-subquery over an aggregate (recursive planning in the ref). */
  private val inSub = GraftQuery(
    "subquery_in_aggregate",
    sql("""SELECT s_nationkey, COUNT(*) AS n_top_suppliers FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem GROUP BY l_suppkey
        HAVING COUNT(*) > 550)
      GROUP BY s_nationkey ORDER BY s_nationkey"""),
    Some("""SELECT s_nationkey, COUNT(*) AS n_top_suppliers FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem GROUP BY l_suppkey
        HAVING COUNT(*) > 550)
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  /** Derived table (subquery in FROM) feeding an outer aggregate. */
  private val fromSub = GraftQuery(
    "subquery_from_derived",
    sql("""SELECT o_orderstatus,
        CAST(SUM(CAST(order_rev AS DECIMAL(18,4))) AS DOUBLE) AS status_rev
      FROM (
        SELECT o_orderstatus, o_orderkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(1 - l_discount AS DECIMAL(4,2))) AS order_rev
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus, o_orderkey)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    Some("""SELECT o_orderstatus,
        CAST(SUM(CAST(order_rev AS DECIMAL(18,4))) AS DOUBLE) AS status_rev
      FROM (
        SELECT o_orderstatus, o_orderkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(1 - l_discount AS DECIMAL(4,2))) AS order_rev
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus, o_orderkey)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Multi-CTE chain, one CTE referenced twice (inlining decision —
    * cte_inline.c; Spark inlines/reuses natively). */
  private val cteChain = GraftQuery(
    "cte_multi_reference",
    sql("""WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey),
      big AS (SELECT * FROM cust_orders WHERE spend >
        (SELECT CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(*) FROM cust_orders))
      SELECT c_nationkey, COUNT(*) AS n_big_spenders,
        CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE) AS nation_spend
      FROM big JOIN customer ON c_custkey = o_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey"""),
    Some("""WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey),
      big AS (SELECT * FROM cust_orders WHERE spend >
        (SELECT CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(*) FROM cust_orders))
      SELECT c_nationkey, COUNT(*) AS n_big_spenders,
        CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE) AS nation_spend
      FROM big JOIN customer ON c_custkey = o_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** NOT IN with null-safety semantics (empty-result trap avoided by
    * design: subquery column is non-null). */
  private val notIn = GraftQuery(
    "subquery_not_in",
    sql("""SELECT p_brand, COUNT(*) AS n FROM part
      WHERE p_partkey NOT IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      GROUP BY p_brand ORDER BY p_brand"""),
    Some("""SELECT p_brand, COUNT(*) AS n FROM part
      WHERE p_partkey NOT IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      GROUP BY p_brand ORDER BY p_brand"""))

  /** EXISTS + NOT EXISTS combined (recurring-outer-join corpus flavor). */
  private val existsCombo = GraftQuery(
    "subquery_exists_combo",
    sql("""SELECT c_mktsegment, COUNT(*) AS n FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderstatus = 'F')
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    Some("""SELECT c_mktsegment, COUNT(*) AS n FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderstatus = 'F')
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Lateral join (PG LATERAL ≙ Spark LATERAL VIEW / lateral subquery):
    * top-2 orders per nation's customers via lateral correlated subquery. */
  private val lateralSub = GraftQuery(
    "subquery_lateral",
    sql("""SELECT n_name, t.o_orderkey, t.o_totalprice
      FROM nation,
      LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_nationkey = n_nationkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY n_name, t.o_orderkey"""),
    Some("""SELECT n_name, t.o_orderkey, t.o_totalprice
      FROM nation,
      LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_nationkey = n_nationkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY n_name, t.o_orderkey"""))

  /** Quantified comparison (`>= ALL (correlated subquery)` — PG surface
    * the reference pushes down when colocated): decorrelated here into a
    * per-group window max, so the 100 TB plan is one shuffle on the
    * correlation key instead of a per-row subquery execution. The oracle
    * runs the genuine ALL form. */
  private val anyAll = GraftQuery(
    "subquery_any_all",
    sql("""SELECT c_custkey, c_nationkey, c_acctbal FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
          MAX(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_max
        FROM customer)
      WHERE c_acctbal >= nation_max
      ORDER BY c_nationkey, c_custkey"""),
    Some("""SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer c
      WHERE c_acctbal >= ALL (
        SELECT c2.c_acctbal FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_nationkey, c_custkey"""))

  /** NOT IN whose subquery yields a NULL: three-valued logic makes
    * `x NOT IN (..., NULL)` never TRUE, so the result is empty — the
    * classic null-aware anti-join trap (Spark plans a null-aware
    * BroadcastHashJoin; engines that rewrite to a plain anti join get
    * this wrong). The non-null control column proves the same query
    * shape returns rows when NULLs are absent. */
  private val notInNulls = GraftQuery(
    "subquery_not_in_nulls",
    sql("""SELECT
        (SELECT COUNT(*) FROM part WHERE p_partkey NOT IN
          (SELECT CASE WHEN l_quantity > 45 THEN NULL ELSE l_partkey END
           FROM lineitem)) AS n_with_null,
        (SELECT COUNT(*) FROM part WHERE p_partkey NOT IN
          (SELECT l_partkey FROM lineitem WHERE l_quantity <= 45))
          AS n_without_null"""),
    Some("""SELECT
        (SELECT COUNT(*) FROM part WHERE p_partkey NOT IN
          (SELECT CASE WHEN l_quantity > 45 THEN NULL ELSE l_partkey END
           FROM lineitem)) AS n_with_null,
        (SELECT COUNT(*) FROM part WHERE p_partkey NOT IN
          (SELECT l_partkey FROM lineitem WHERE l_quantity <= 45))
          AS n_without_null"""))

  override val queries: Seq[GraftQuery] = Seq(
    scalarSub, correlated, inSub, fromSub, cteChain, notIn, existsCombo,
    lateralSub, anyAll, notInNulls)
}
