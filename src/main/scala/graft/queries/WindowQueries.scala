package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Window function corpus (reference: `sql/window_functions.sql`,
  * `multi_subquery_window_functions.sql`). Citus only pushes windows
  * whose PARTITION BY contains the distribution column
  * (`SafeToPushdownWindowFunction`, query_pushdown_planning.c:428-472);
  * Spark shuffles by the partition spec automatically, with no
  * restriction. All ORDER BYs carry unique tiebreaks so rank/lag values
  * are deterministic across engines.
  */
object WindowQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** rank / dense_rank / row_number / ntile. */
  private val ranking = GraftQuery(
    "window_ranking",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rn") <= 5)
        .orderBy(col("o_orderstatus"), col("rn"))
    },
    Some("""SELECT * FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
          DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 5 ORDER BY o_orderstatus, rn"""))

  /** Running aggregate over ROWS frame (exact decimal running sum). */
  private val runningSum = GraftQuery(
    "window_running_sum",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(money(col("o_totalprice"))).over(w).cast(DoubleType)
            .as("running_total"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_total,
      COUNT(*) OVER w AS running_n
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  /** lag / lead / first_value / last_value with explicit frames. */
  private val lagLead = GraftQuery(
    "window_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_orderkey")).over(wf).as("first_key"),
          last(col("o_orderkey")).over(wf).as("last_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
      LAG(o_totalprice, 1) OVER w AS prev_price,
      LEAD(o_totalprice, 1) OVER w AS next_price,
      FIRST_VALUE(o_orderkey) OVER wf AS first_key,
      LAST_VALUE(o_orderkey) OVER wf AS last_key
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""))

  /** RANGE frame over a numeric ordering column. */
  private val rangeFrame = GraftQuery(
    "window_range_frame",
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"))
        .rangeBetween(-1000, 0)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(money(col("l_quantity"))).over(w).cast(DoubleType)
            .as("qty_in_range"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE) AS qty_in_range
      FROM lineitem WHERE l_suppkey < 10
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey
                   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
      ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  /** Aggregate-as-window + ratio to partition total. */
  private val shareOfTotal = GraftQuery(
    "window_share_of_total",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(money(col("o_totalprice"))).as("grp"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("grp").cast(DoubleType).as("group_total"),
          (col("grp").cast(DoubleType) /
            sum(col("grp")).over(w).cast(DoubleType)).as("share"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    Some("""WITH g AS (
        SELECT o_orderstatus, o_orderpriority,
          SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS grp
        FROM orders GROUP BY o_orderstatus, o_orderpriority)
      SELECT o_orderstatus, o_orderpriority,
        CAST(grp AS DOUBLE) AS group_total,
        CAST(grp AS DOUBLE) /
          CAST(SUM(grp) OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS share
      FROM g ORDER BY o_orderstatus, o_orderpriority"""))

  /** GROUPS-mode frame (`GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW` —
    * PG window surface that neither Spark nor DuckDB implements): the
    * peer-group frame rewrites to a RANGE frame over `dense_rank` of
    * the order key — dense_rank numbers peer groups consecutively, so
    * "±k groups" IS "±k in dense_rank space". The oracle computes the
    * same semantics a THIRD way (per-group sums + lag + join back), so
    * the rewrite is checked against an independent formulation. */
  private val groupsFrame = GraftQuery(
    "window_groups_frame",
    (s, dir) => {
      val wRank = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("d"))
      val wFrame = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("dr")).rangeBetween(-1, 0)
      t(s, dir, "orders")
        .filter(col("o_orderdate") < ts("1996-04-01"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate").cast(DateType).as("d"),
          cents(col("o_totalprice")).as("tc"))
        .withColumn("dr", dense_rank().over(wRank))
        .withColumn("grp_sum",
          (sum(col("tc")).over(wFrame).cast(DoubleType) / 100)
            .as("grp_sum"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("d"),
          col("grp_sum"))
        .orderBy(col("o_orderstatus"), col("d"), col("o_orderkey"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS d,
          CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tc
        FROM orders WHERE o_orderdate < TIMESTAMP '1996-04-01'),
      per_day AS (
        SELECT o_orderstatus, d, SUM(tc) AS day_sum
        FROM base GROUP BY 1, 2),
      framed AS (
        SELECT o_orderstatus, d,
          day_sum + COALESCE(LAG(day_sum) OVER (
            PARTITION BY o_orderstatus ORDER BY d), 0) AS frame_sum
        FROM per_day)
      SELECT b.o_orderkey, b.o_orderstatus, b.d,
        CAST(f.frame_sum AS DOUBLE) / 100 AS grp_sum
      FROM base b JOIN framed f
        ON b.o_orderstatus = f.o_orderstatus AND b.d = f.d
      ORDER BY b.o_orderstatus, b.d, b.o_orderkey"""))

  /** Aggregate FILTER clause on a window (PG: `count(*) FILTER (WHERE
    * c) OVER w` — the reference inherits it from PostgreSQL; Spark has
    * no window FILTER, so the engine rewrites it to the conditional-agg
    * form `count(when(c, 1)) OVER w`, identical semantics). The oracle
    * runs the GENUINE FILTER syntax in DuckDB, pinning the rewrite. */
  private val filterClause = GraftQuery(
    "window_filter_clause",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 3000)
        .select(col("o_orderstatus"), col("o_orderkey"),
          count(when(col("o_orderpriority") === "1-URGENT", lit(1)))
            .over(w).as("urgent_so_far"),
          sum(when(col("o_orderpriority") === "1-URGENT",
              money(col("o_totalprice"))).otherwise(lit(0)))
            .over(w).cast(DoubleType).as("urgent_value_so_far"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },
    Some("""SELECT o_orderstatus, o_orderkey,
        COUNT(*) FILTER (o_orderpriority = '1-URGENT') OVER w
          AS urgent_so_far,
        CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            FILTER (o_orderpriority = '1-URGENT') OVER w, 0)
          AS DOUBLE) AS urgent_value_so_far
      FROM orders WHERE o_orderkey < 3000
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_orderstatus, o_orderkey"""))

  /** Frame EXCLUDE CURRENT ROW (PG window surface Spark lacks): "sum of
    * the others in my partition" rewrites to frame-sum minus own value —
    * one window pass plus a subtraction, no self-join. Oracle runs
    * DuckDB's genuine EXCLUDE CURRENT ROW syntax. */
  private val excludeCurrent = GraftQuery(
    "window_exclude_current",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderstatus"), col("o_orderkey"),
          cents(col("o_totalprice")).as("tc"))
        .select(col("o_orderstatus"), col("o_orderkey"),
          // genuine EXCLUDE yields NULL over an empty (singleton) frame,
          // not 0 — match that, don't just subtract
          when(count(lit(1)).over(w) > 1,
            (sum(col("tc")).over(w) - col("tc")).cast(DoubleType) / 100)
            .as("others_total"),
          (count(lit(1)).over(w) - 1).as("n_others"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },
    Some("""SELECT o_orderstatus, o_orderkey,
        CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w
          AS DOUBLE) / 100 AS others_total,
        COUNT(*) OVER w AS n_others
      FROM orders WHERE o_orderkey < 2000
      WINDOW w AS (PARTITION BY o_orderstatus
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   EXCLUDE CURRENT ROW)
      ORDER BY o_orderstatus, o_orderkey"""))

  /** IGNORE NULLS in navigation window functions (PG/standard SQL;
    * window_functions.sql corpus) — Spark's lag/lead/first/last all
    * take an ignoreNulls flag, DuckDB runs the genuine
    * `f(x IGNORE NULLS)` syntax. Nullable input derived with a CASE
    * so both engines see identical NULL positions. */
  private val ignoreNulls = GraftQuery(
    "window_ignore_nulls",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .withColumn("p",
          when(col("o_totalprice") > 2000, col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("p"), 1, null, ignoreNulls = true).over(w)
            .as("prev_big"),
          lead(col("p"), 1, null, ignoreNulls = true).over(w)
            .as("next_big"),
          first(col("p"), ignoreNulls = true).over(wf).as("first_big"),
          last(col("p"), ignoreNulls = true).over(wf).as("last_big"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      LAG(p IGNORE NULLS) OVER w AS prev_big,
      LEAD(p IGNORE NULLS) OVER w AS next_big,
      FIRST_VALUE(p IGNORE NULLS) OVER wf AS first_big,
      LAST_VALUE(p IGNORE NULLS) OVER wf AS last_big
      FROM (SELECT *, CASE WHEN o_totalprice > 2000 THEN o_totalprice END
            AS p FROM orders WHERE o_custkey < 100)
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""))

  override val queries: Seq[GraftQuery] = Seq(
    ranking, runningSum, lagLead, rangeFrame, shareOfTotal, groupsFrame,
    filterClause, excludeCurrent, ignoreNulls)
}
