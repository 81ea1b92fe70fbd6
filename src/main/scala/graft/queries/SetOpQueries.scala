package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dsl._

/** Set operations + sort/limit corpus. Reference: UNION pushdown needs
  * distribution-column alignment (`relation_restriction_equivalence.c:
  * 284-303`), INTERSECT/EXCEPT always go through recursive planning
  * (`sql/set_operations.sql`); Spark runs all of them distributed.
  * ORDER BY + LIMIT maps to TakeOrderedAndProject — exactly the
  * reference's worker-partial-top-k + coordinator merge
  * (`WorkerLimitCount`, multi_logical_optimizer.c:5039).
  */
object SetOpQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private def custSample(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = t(s, dir, "customer")
    (c.filter(col("c_acctbal") > 5000).select(col("c_custkey"), col("c_nationkey")),
      c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_nationkey")))
  }

  private val unionAll = GraftQuery(
    "setop_union_all",
    (s, dir) => {
      val (a, b) = custSample(s, dir)
      a.union(b)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, COUNT(*) AS n FROM (
        SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT c_custkey, c_nationkey FROM customer
        WHERE c_mktsegment = 'BUILDING')
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  private val unionDistinct = GraftQuery(
    "setop_union_distinct",
    (s, dir) => {
      val (a, b) = custSample(s, dir)
      a.union(b).distinct()
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, COUNT(*) AS n FROM (
        SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
        UNION
        SELECT c_custkey, c_nationkey FROM customer
        WHERE c_mktsegment = 'BUILDING')
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  private val intersectQ = GraftQuery(
    "setop_intersect",
    (s, dir) => {
      val (a, b) = custSample(s, dir)
      a.intersect(b).orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT c_custkey, c_nationkey FROM customer
      WHERE c_mktsegment = 'BUILDING'
      ORDER BY c_custkey"""))

  private val exceptQ = GraftQuery(
    "setop_except",
    (s, dir) => {
      val (a, b) = custSample(s, dir)
      a.except(b).orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT c_custkey, c_nationkey FROM customer
      WHERE c_mktsegment = 'BUILDING'
      ORDER BY c_custkey"""))

  /** EXCEPT ALL / INTERSECT ALL (bag semantics — Spark exceptAll). */
  private val exceptAll = GraftQuery(
    "setop_except_all",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.select(col("l_partkey"))
      val b = li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
      a.exceptAll(b)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        .filter(col("l_partkey") < 50)
        .orderBy(col("l_partkey"))
    },
    Some("""SELECT l_partkey, COUNT(*) AS n FROM (
        SELECT l_partkey FROM lineitem
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      WHERE l_partkey < 50
      GROUP BY l_partkey ORDER BY l_partkey"""))

  /** Global top-k: TakeOrderedAndProject (partial top-k per partition). */
  private val topK = GraftQuery(
    "sort_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25),
    Some("""SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""))

  /** LIMIT + OFFSET pagination with a deterministic sort. */
  private val limitOffset = GraftQuery(
    "sort_limit_offset",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(50)
        .limit(20),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 50"""))

  /** Multi-key mixed-direction sort with NULLS placement: PG defaults to
    * NULLS LAST on ASC, Spark to NULLS FIRST — pinned explicitly
    * (SURVEY §7.4 risk 2). */
  private val nullsOrder = GraftQuery(
    "sort_nulls_order",
    (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal"))
        .filter(col("c_custkey") <= 200)
        .orderBy(col("bal").asc_nulls_last, col("c_custkey")),
    Some("""SELECT c_custkey,
      CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer WHERE c_custkey <= 200
      ORDER BY bal ASC NULLS LAST, c_custkey"""))

  /** Custom whole-operator plan: top-3 per group via bounded heaps
    * (graft.plans.TopKPerGroup — partial heap per partition, one
    * shuffle of survivors, merge) instead of the sort-everything
    * window; oracle is the equivalent row_number window. */
  private val topKPerGroup = GraftQuery(
    "sort_topk_per_group",
    (s, dir) =>
      graft.plans.TopKPerGroup(
        t(s, dir, "orders"),
        groupCols = Seq(col("o_orderstatus")),
        orderCols = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("o_totalprice").desc,
          col("o_orderkey")),
    Some("""SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderstatus
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn <= 3
      ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey"""))

  /** `FETCH FIRST n ROWS WITH TIES` (PG 13+; reference inherits it):
    * neither Spark nor DuckDB has WITH TIES. The scale-safe plan is
    * threshold-then-filter, NOT a global rank() window (an
    * unpartitioned WindowExec funnels every row through one task at
    * 100 TB): pass 1 finds the n-th boundary key with a distributed
    * partial top-k (`orderBy().limit(n)` → TakeOrderedAndProject,
    * each task keeps ≤n rows); pass 2 is a distributed
    * `filter(key <= boundary)` with the 1-row boundary broadcast —
    * ties of the boundary row are admitted by construction, which is
    * exactly the WITH TIES contract. Fewer than n input rows → the
    * boundary is the global max → the filter admits everything,
    * matching PG. Oracle uses DuckDB's QUALIFY rank() form of the
    * same contract. */
  private val fetchWithTies = GraftQuery(
    "sort_fetch_with_ties",
    (s, dir) => {
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val boundary = base.orderBy(col("o_orderpriority")).limit(10)
        .agg(max(col("o_orderpriority")).as("__wt_th"))
      base.crossJoin(broadcast(boundary))
        .filter(col("o_orderpriority") <= col("__wt_th"))
        .drop("__wt_th")
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderkey < 500
      QUALIFY RANK() OVER (ORDER BY o_orderpriority) <= 10
      ORDER BY o_orderpriority, o_orderkey"""))

  /** `OFFSET o FETCH FIRST n ROWS WITH TIES` through the DIALECT's
    * threshold-then-filter path (pg13_with_ties.sql's shape): the
    * boundary pre-filter bounds the rank window's input to
    * O(answer) rows — the scale-safe plan — while the rank /
    * row_number machinery applies PG's exact offset+ties contract.
    * Output is the ORDER BY key alone so the result multiset is
    * deterministic across tie-group cuts. DuckDB runs the rank
    * cutoff contract explicitly. */
  private val fetchTiesOffset = GraftQuery(
    "sort_fetch_ties_offset",
    (s, dir) => {
      graft.Tables.registerAll(s, dir)
      graft.sql.PgDialect.sql(s,
        """SELECT o_orderpriority FROM orders
          WHERE o_orderkey < 300
          ORDER BY o_orderpriority
          OFFSET 3 FETCH FIRST 5 ROWS WITH TIES""")
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH ranked AS (
        SELECT o_orderpriority,
               rank() OVER (ORDER BY o_orderpriority) AS rk,
               row_number() OVER (ORDER BY o_orderpriority) AS rn
        FROM orders WHERE o_orderkey < 300)
      SELECT o_orderpriority FROM ranked
      WHERE rn > 3 AND rk <= coalesce(
        (SELECT max(rk) FROM ranked WHERE rn = 8), 2147483647)
      ORDER BY o_orderpriority"""))

  override val queries: Seq[GraftQuery] = Seq(
    unionAll, unionDistinct, intersectQ, exceptQ, exceptAll,
    topK, limitOffset, nullsOrder, topKPerGroup, fetchWithTies,
    fetchTiesOffset)
}
