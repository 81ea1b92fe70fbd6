package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Aggregate inventory from the reference's `AggregateType` enum
  * (citus `src/include/distributed/multi_logical_optimizer.h:65-101`) and
  * its two-phase worker/coordinator split
  * (`multi_logical_optimizer.c:1427,1643,2394`). Spark's HashAggregate
  * partial→final mode is that mechanism natively; these queries pin the
  * semantics of each aggregate class (avg decomposition, count→sum,
  * distinct, bool/bit, array_agg, any_value, having/distinct-on/rollup).
  */
object AggQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** avg/sum/min/max/count — the core two-phase split set. */
  private val basic = GraftQuery(
    "agg_basic_stats",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(money(col("o_totalprice"))).as("sum_price"),
          davg(money(col("o_totalprice"))).as("avg_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
      MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Exact count(DISTINCT) — citus pulls distinct cols to the coordinator
    * unless grouped by the dist col (multi_logical_optimizer.c:1710-1755);
    * Spark expands to a two-stage distinct aggregate natively. */
  private val countDist = GraftQuery(
    "agg_count_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps,
      COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
      COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** HLL path: citus `count_distinct_error_rate>0` →
    * hll_add_agg/hll_union_agg (multi_logical_optimizer.c:1756-1806).
    * Spark: approx_count_distinct (HLL++). The sketch estimate itself is
    * engine-specific, so the oracle-checkable output is the exact count
    * plus a bounded-error verdict (HLL++ at rsd 0.01 vs 5 % tolerance) —
    * deterministic, so DuckDB pins it as TRUE.
    *
    * r13: the approx and exact-distinct aggregates run as TWO
    * aggregations joined on the group key, not one. Mixed in a single
    * agg, Spark's multi-distinct rewrite (Expand + 3 aggregate layers)
    * carries the HLL++ buffer as a partial through the distinct
    * layers, register-merging the 2^14-register sketch (rsd 0.01) once
    * per intermediate (group × distinct-key) row — measured 4+ MINUTES
    * of CPU on one task at sf0.1 (thread dump: HyperLogLogPlusPlus.eval
    * inside hashAgg_doAggregateWithKeys). Split, the HLL agg sees one
    * cheap register update per row and merges 4 sketches; the distinct
    * expand carries only long counters. Same aggregates, same rows —
    * the join key is the group key, so results are identical. */
  private val approxDist = GraftQuery(
    "agg_approx_count_distinct",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("parts_ok"),
          (abs(col("ao") - col("exact_orders")) <=
            col("exact_orders") * 0.05).as("orders_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      COUNT(DISTINCT l_partkey) AS exact_parts,
      COUNT(DISTINCT l_orderkey) AS exact_orders,
      TRUE AS parts_ok, TRUE AS orders_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** bool_and/bool_or/every + bit_and/bit_or (enum :76-80, bool_agg.sql). */
  private val boolBit = GraftQuery(
    "agg_bool_bit",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_and(col("l_discount") > 0.05).as("all_discounted"),
          bool_or(col("l_tax") > 0.07).as("any_high_tax"),
          every(col("l_extendedprice") > 0).as("every_priced"),
          bit_and(col("l_linenumber")).as("band_linenum"),
          bit_or(col("l_linenumber")).as("bor_linenum"),
          bit_xor(col("l_linenumber").cast(LongType)).as("bxor_linenum"))
        .orderBy(col("l_linestatus")),
    Some("""SELECT l_linestatus,
      BOOL_AND(l_quantity > 0) AS all_positive,
      BOOL_AND(l_discount > 0.05) AS all_discounted,
      BOOL_OR(l_tax > 0.07) AS any_high_tax,
      BOOL_AND(l_extendedprice > 0) AS every_priced,
      BIT_AND(l_linenumber) AS band_linenum,
      BIT_OR(l_linenumber) AS bor_linenum,
      BIT_XOR(CAST(l_linenumber AS BIGINT)) AS bxor_linenum
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** array_agg → collect_list (unordered in citus too, which rejects
    * ORDER BY inside: DeferErrorIfUnsupportedArrayAggregate). Sorted and
    * joined to a string for a deterministic cross-engine compare. */
  private val arrayAgg = GraftQuery(
    "agg_array_agg",
    (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          size(collect_set(col("n_name"))).as("n_distinct"))
        .orderBy(col("n_regionkey")),
    Some("""SELECT n_regionkey,
      array_to_string(list_sort(list(n_name)), ',') AS nations,
      len(list_distinct(list(n_name))) AS n_distinct
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** any_value (enum :85, sql/udfs/any_value/) — deterministic here since
    * n_name is functionally dependent on the grouping key. */
  private val anyVal = GraftQuery(
    "agg_any_value",
    (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_nationkey"))
        .agg(
          any_value(col("n_name")).as("nation_name"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey")),
    Some("""SELECT c_nationkey, ANY_VALUE(n_name) AS nation_name,
      COUNT(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** max_by/min_by (PG's newer aggregates; arg_max/arg_min in DuckDB).
    * Keyed by the unique o_orderkey so the argmax is deterministic. */
  private val argMinMax = GraftQuery(
    "agg_max_by",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_priority"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("earliest_priority"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
      ARG_MAX(o_orderpriority, o_orderkey) AS latest_priority,
      ARG_MIN(o_orderpriority, o_orderkey) AS earliest_priority,
      MAX(o_orderkey) AS max_key
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** HAVING pushdown (ProcessHavingClauseForWorkerQuery :2650). */
  private val having = GraftQuery(
    "agg_having",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(dsum(money(col("l_quantity"))).as("total_qty"),
          count(lit(1)).as("n_lines"))
        .filter(col("total_qty") > 15000)
        .orderBy(col("l_suppkey")),
    Some("""SELECT l_suppkey,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
      COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_suppkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 15000
      ORDER BY l_suppkey"""))

  /** SELECT DISTINCT (ProcessDistinctClauseForWorkerQuery :2726). */
  private val distinctQ = GraftQuery(
    "agg_select_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** DISTINCT ON rewrite — PG's DISTINCT ON has no Spark equivalent; the
    * engine rewrites it to row_number()=1 (SURVEY §2.4). Latest order per
    * customer, ties broken by o_orderkey. */
  private val distinctOn = GraftQuery(
    "agg_distinct_on",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1 ORDER BY o_custkey"""))

  /** Aggregate FILTER clause (aggfilter pass-through :1700-1706). */
  private val aggFilter = GraftQuery(
    "agg_filter_clause",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("value") > 5, 1)).as("n_high"),
          dsum(when(col("value") > 5, money(col("value")))
            .otherwise(lit(null))).as("sum_high"),
          countDistinct(when(col("value") > 5, col("user_id"))).as("users_high"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(*) AS n_events,
      COUNT(*) FILTER (WHERE value > 5) AS n_high,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) FILTER (WHERE value > 5) AS DOUBLE) AS sum_high,
      COUNT(DISTINCT user_id) FILTER (WHERE value > 5) AS users_high
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** ROLLUP — the reference ERRORS on distributed grouping sets
    * (multi_logical_planner.c:915-921); Spark does them natively, so the
    * engine exceeds the reference here. Group keys coalesced to 'ALL'
    * (no native NULLs in these columns) for a stable cross-engine sort. */
  private val rollupQ = GraftQuery(
    "agg_rollup",
    (s, dir) =>
      // r13 (guide §2.3 aggregate-before-expand): ROLLUP's Expand
      // multiplies every input row by the grouping-set count (×3 =
      // 1.8M expanded rows, each updating a decimal-sum buffer).
      // Aggregate to the finest grain FIRST (≤ 8 rows), then roll the
      // partials up — exact: the decimal sum reassociates losslessly,
      // count(*) becomes sum of counts, and the double cast still
      // happens once at the end. Measured 1.06 → 0.50 s. (agg_cube /
      // agg_grouping_sets fit the same pattern but measured ≤ 0.33 s
      // on smaller inputs — left on the native path.)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("pn"),
          sum(money(col("l_quantity"))).as("pq"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("pn")).as("n"), dsum(col("pq")).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy(col("returnflag"), col("linestatus")),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** CUBE (same exceeds-reference note as rollup). */
  private val cubeQ = GraftQuery(
    "agg_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy(col("status"), col("priority")),
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  /** GROUPING SETS via SQL (Spark-native; reference errors on it). */
  private val groupingSets = GraftQuery(
    "agg_grouping_sets",
    (s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")
    },
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority"""))

  /** stddev/variance with exact decimal moments: both engines compute
    * sqrt((n·Σx² − (Σx)²) / (n(n−1))) from bit-identical decimal sums, so
    * the doubles match exactly (streaming stddev would not). */
  private val stddevVar = GraftQuery(
    "agg_stddev_variance",
    (s, dir) => {
      val x = money(col("o_totalprice"))
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sx"),
          sum(x * x).cast(DoubleType).as("sxx"))
        .select(
          col("o_orderstatus"),
          col("n"),
          // Rounded before output/sqrt: with Σx² ≈ 1e17 the double
          // product n·Σx² exceeds 2^53 and engines may fuse (FMA) the
          // multiply-subtract differently — rounding at 1e-2 absorbs
          // that last-ulp divergence while staying exact for the data.
          round((col("sxx") * col("n") - col("sx") * col("sx")) /
            (col("n") * (col("n") - lit(1))), 2).as("variance"),
          sqrt(round((col("sxx") * col("n") - col("sx") * col("sx")) /
            (col("n") * (col("n") - lit(1))), 2)).as("stddev"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH m AS (
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx
        FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, n,
        round((sxx * n - sx * sx) / (n * (n - 1)), 2) AS variance,
        sqrt(round((sxx * n - sx * sx) / (n * (n - 1)), 2)) AS stddev
      FROM m ORDER BY o_orderstatus"""))

  /** Exact percentile (PG percentile_cont ≙ Spark `percentile`): linear
    * interpolation over integer-valued quantities is exact in double.
    * r13 (guide §4): ONE array-form percentile call — Spark's
    * Percentile builds a full per-group value-count buffer PER CALL,
    * so three scalar calls built (and sorted) three copies; the array
    * form computes the same three interpolations from one buffer
    * (identical values — the same counts map is queried per element). */
  private val percentileExact = GraftQuery(
    "agg_percentile_exact",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, array(0.5, 0.25, 0.95))")
          .as("ps"))
        .select(col("l_returnflag"),
          col("ps").getItem(0).as("p50"),
          col("ps").getItem(1).as("p25"),
          col("ps").getItem(2).as("p95"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS p50,
      quantile_cont(l_quantity, 0.25) AS p25,
      quantile_cont(l_quantity, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** tdigest_percentile analogue: Spark percentile_approx (GK sketch).
    * The sketch picks an actual data value, so the oracled output is the
    * exact interpolated percentile plus a 2 %-relative-error verdict on
    * the approximation (deterministic → DuckDB pins TRUE). */
  private val percentileApprox = GraftQuery(
    "agg_percentile_approx",
    (s, dir) =>
      // r13 (guide §4): array-form calls — one GK sketch and one exact
      // value-count buffer instead of two of each (same per-element
      // results; see agg_percentile_exact).
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.99)), lit(1000)).as("as_"),
          expr("percentile(l_extendedprice, array(0.5, 0.99))").as("ps"))
        .select(col("l_returnflag"),
          col("ps").getItem(0).as("p50_exact"),
          col("ps").getItem(1).as("p99_exact"),
          (abs(col("as_").getItem(0) - col("ps").getItem(0)) <=
            col("ps").getItem(0) * 0.02).as("p50_ok"),
          (abs(col("as_").getItem(1) - col("ps").getItem(1)) <=
            col("ps").getItem(1) * 0.02).as("p99_ok"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      quantile_cont(l_extendedprice, 0.5) AS p50_exact,
      quantile_cont(l_extendedprice, 0.99) AS p99_exact,
      TRUE AS p50_ok, TRUE AS p99_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** PIVOT / crosstab (PostgreSQL tablefunc `crosstab`; Spark native
    * `pivot`). Catalyst plans it as ONE grouped aggregate with a
    * conditional-agg column per pivot value — same shuffle profile as
    * any groupBy, no per-value passes. Missing cells filled with 0 to
    * match the FILTER-count oracle. */
  private val pivotQ = GraftQuery(
    "agg_pivot",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
      COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
      COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
      COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
      COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
        AS "4-NOT SPECIFIED",
      COUNT(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Deterministic hash-mod sampling (TABLESAMPLE's scalable cousin):
    * a stable 1/16 sample keyed on the row identity via a portable
    * hash, so every executor — and every RERUN — picks the same rows
    * with zero coordination. This is how a 100 TB pipeline samples:
    * pure map-side predicate, pushes nothing to the driver, and the
    * sample is reproducible for A/B offline evals. */
  private val sampleHashMod = GraftQuery(
    "sample_hash_mod",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          (conv(substring(md5(concat_ws(":",
            col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 16) === 0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"),
          dsum(money(col("l_quantity"))).as("sample_qty"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(*) AS n_sampled,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sample_qty
      FROM lineitem
      WHERE ('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)||':'||
        CAST(l_linenumber AS VARCHAR)),1,15))::BIGINT % 16 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** PG ordered-set aggregates — `mode() WITHIN GROUP` and
    * `percentile_disc(0.5) WITHIN GROUP` — as deterministic
    * compositions (count + rank for mode with a value tie-break;
    * row_number at ceil(n/2) for the discrete median), written
    * IDENTICALLY in both engines so ties can't diverge. Shuffle
    * profile: one partial+final count agg and one window sort per
    * group key — both scale-safe. */
  private val orderedSet = GraftQuery(
    "agg_ordered_set",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val wMode = Window.partitionBy(col("f"))
        .orderBy(col("c").desc, col("st"))
      val mode = li
        .groupBy(col("l_returnflag").as("f"), col("l_linestatus").as("st"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wMode))
        .filter(col("rn") === 1)
        .select(col("f"), col("st").as("modal_status"),
          col("c").as("mode_cnt"))
      // r13 (guide §2.3 aggregate-before-sort): the discrete median is
      // the value at sorted position k = ceil(n/2). Instead of
      // row_number over every ROW (a full 600k-row window sort), count
      // per (group, value) first — quantities have ~100 distinct
      // values — and pick the value whose cumulative count straddles
      // k. Same value by construction (ties share the value), the
      // window now sorts ~100 rows per group.
      val wCum = Window.partitionBy(col("f")).orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("f"))
      val p50 = li
        .groupBy(col("l_returnflag").as("f"), col("l_quantity"))
        .agg(count(lit(1)).as("qc"))
        .select(col("f"), col("l_quantity"),
          sum(col("qc")).over(wCum).as("cum"),
          col("qc"),
          sum(col("qc")).over(wAll).as("n"))
        .filter(col("cum") - col("qc") <
            ceil(col("n") * 0.5).cast("long") &&
          ceil(col("n") * 0.5).cast("long") <= col("cum"))
        .select(col("f"), col("l_quantity").as("p50_qty"))
      mode.join(p50, "f")
        .select(col("f").as("l_returnflag"), col("modal_status"),
          col("mode_cnt"), col("p50_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH counts AS (
        SELECT l_returnflag AS f, l_linestatus AS st, COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2),
      m AS (
        SELECT f, st, c,
          ROW_NUMBER() OVER (PARTITION BY f ORDER BY c DESC, st) AS rn
        FROM counts),
      q AS (
        SELECT l_returnflag AS f, l_quantity,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY l_quantity) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      p AS (
        SELECT f, l_quantity AS p50_qty FROM q
        WHERE rn = CAST(ceil(n * 0.5) AS BIGINT))
      SELECT m.f AS l_returnflag, m.st AS modal_status,
        CAST(m.c AS BIGINT) AS mode_cnt, p.p50_qty
      FROM m JOIN p ON m.f = p.f
      WHERE m.rn = 1
      ORDER BY l_returnflag"""))

  /** Consistent per-group sampling = bottom-k by a portable hash (the
    * KMV/bottom-k sketch's row-selection rule): every engine, every
    * run, every SF picks the same representatives per group. Runs on
    * the custom TopKPerGroup operator (bounded per-partition heaps →
    * shuffle k survivors per group → merge), so the per-group sample
    * never materializes a full sort — at 100 TB each executor ships at
    * most k rows per group. */
  private val sampleBottomK = GraftQuery(
    "sample_bottomk_per_group",
    (s, dir) => {
      val keyed = t(s, dir, "lineitem")
        .withColumn("hk", md5(concat_ws(":",
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"))))
      graft.plans.TopKPerGroup(keyed,
          groupCols = Seq(col("l_returnflag")),
          orderCols = Seq(col("hk").asc),
          k = 3)
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("hk"))
        .orderBy(col("l_returnflag"), col("hk"))
    },
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, hk FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber,
          md5(CAST(l_orderkey AS VARCHAR)||':'||
            CAST(l_linenumber AS VARCHAR)) AS hk,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY md5(CAST(l_orderkey AS VARCHAR)||':'||
              CAST(l_linenumber AS VARCHAR))) AS rn
        FROM lineitem) WHERE rn <= 3
      ORDER BY l_returnflag, hk"""))

  /** GROUPING()/GROUPING_ID() — the functions that disambiguate "NULL
    * because superaggregate" from "NULL in the data" under rollup
    * (PG inherits them; Spark implements both natively). */
  private val groupingFn = GraftQuery(
    "agg_grouping_function",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("-")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("-")).as("linestatus"),
          col("n"), col("g_flag").cast(LongType),
          col("g_status").cast(LongType), col("gid"))
        .orderBy(col("gid"), col("returnflag"), col("linestatus")),
    Some("""SELECT COALESCE(l_returnflag, '-') AS returnflag,
      COALESCE(l_linestatus, '-') AS linestatus, COUNT(*) AS n,
      CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
        AS gid
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, returnflag, linestatus"""))

  /** Aggregates over an EMPTY input: a global aggregate yields exactly
    * one row (count 0, everything else NULL) while a grouped aggregate
    * yields zero rows — the SQL-semantics corner every engine must get
    * right (and the partial/final split must preserve). */
  private val emptyInput = GraftQuery(
    "agg_empty_input",
    (s, dir) => {
      val none = t(s, dir, "lineitem").filter(lit(false))
      val global = none.agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        avg(col("l_quantity")).as("avg_qty"))
      val grouped = none.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_groups"))
      global.crossJoin(grouped)
    },
    Some("""SELECT
        (SELECT COUNT(*) FROM lineitem WHERE FALSE) AS n,
        (SELECT SUM(l_quantity) FROM lineitem WHERE FALSE) AS sum_qty,
        (SELECT MIN(l_quantity) FROM lineitem WHERE FALSE) AS min_qty,
        (SELECT AVG(l_quantity) FROM lineitem WHERE FALSE) AS avg_qty,
        (SELECT COUNT(*) FROM (SELECT l_returnflag FROM lineitem
          WHERE FALSE GROUP BY l_returnflag)) AS n_groups"""))

  override val queries: Seq[GraftQuery] = Seq(
    basic, countDist, approxDist, boolBit, arrayAgg, anyVal, argMinMax,
    having, distinctQ, distinctOn, aggFilter, rollupQ, cubeQ, groupingSets,
    stddevVar, percentileExact, percentileApprox, pivotQ, sampleHashMod,
    orderedSet, sampleBottomK, groupingFn, emptyInput)
}
