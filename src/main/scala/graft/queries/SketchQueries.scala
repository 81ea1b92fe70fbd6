package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import graft.functions.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Sketch-aggregate query surface: topn / tdigest / HLL-sketch-column
  * analogues of the reference's extension aggregates (SURVEY §2.4 rows
  * 16-31). topn runs with capacity ≥ distinct count → EXACT → full
  * oracle; tdigest and HLL sketches are approximate → rows-only here,
  * with tolerance specs in SketchSpec.
  */
object SketchQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** topn_add_agg/topn_union_agg analogue: top-3 order priorities per
    * status. Capacity 64 ≥ 5 distinct → exact; oracle via window rank. */
  private val topn = GraftQuery(
    "sketch_topn",
    (s, dir) => {
      val topnUdaf = udaf(new Sketches.TopNAgg(3, 64))
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(topnUdaf(col("o_orderpriority")).as("top_items"))
        .select(col("o_orderstatus"), posexplode(col("top_items")))
        .select(col("o_orderstatus"), (col("pos") + 1).as("rank"),
          col("col.item").as("item"), col("col.cnt").as("cnt"))
        .orderBy(col("o_orderstatus"), col("rank"))
    },
    Some("""SELECT o_orderstatus, rank, item, cnt FROM (
        SELECT o_orderstatus, o_orderpriority AS item, COUNT(*) AS cnt,
          ROW_NUMBER() OVER (PARTITION BY o_orderstatus
            ORDER BY COUNT(*) DESC, o_orderpriority) AS rank
        FROM orders GROUP BY o_orderstatus, o_orderpriority)
      WHERE rank <= 3 ORDER BY o_orderstatus, rank"""))

  /** tdigest_percentile analogue (semantic parity). The digest estimate
    * is engine-specific, so the oracled output is the group size plus a
    * 2 %-relative-error verdict of the t-digest against the exact
    * percentile — robust to partial-merge order, so DuckDB pins TRUE
    * (magnitude tolerance also asserted in SketchSpec). */
  private val tdigest = GraftQuery(
    "sketch_tdigest_percentile",
    (s, dir) => {
      val td = udaf(new Sketches.TDigestAgg(100, Seq(0.5, 0.95, 0.99)))
      // r13 (guide §4): one array-form exact percentile instead of
      // three scalar calls (each built its own full value-count
      // buffer; same per-element results — see agg_percentile_exact).
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(td(col("l_extendedprice")).as("qs"),
          expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
            .as("es"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("n_rows"),
          (abs(col("qs").getItem(0) - col("es").getItem(0)) <=
            col("es").getItem(0) * 0.02).as("p50_ok"),
          (abs(col("qs").getItem(1) - col("es").getItem(1)) <=
            col("es").getItem(1) * 0.02).as("p95_ok"),
          (abs(col("qs").getItem(2) - col("es").getItem(2)) <=
            col("es").getItem(2) * 0.02).as("p99_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_rows,
      TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** hll_add_agg/hll_union_agg analogue with a REAL sketch column:
    * per-(status,priority) HLL sketches built with hll_sketch_agg
    * (DataSketches), then UNIONED across priorities with hll_union_agg —
    * the exact two-level pattern citus uses for distributed
    * count-distinct. Register-max union is order-independent, so the
    * 5 %-error verdict vs the exact distinct count is deterministic and
    * DuckDB pins it TRUE (estimate tolerance also in SketchSpec). */
  private val hllUnion = GraftQuery(
    "sketch_hll_union",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val est = o.groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
        .groupBy(col("o_orderstatus"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .as("approx_customers"))
      val exact = o.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("exact_customers"))
      est.join(exact, "o_orderstatus")
        .select(col("o_orderstatus"), col("exact_customers"),
          (abs(col("approx_customers") - col("exact_customers")) <=
            col("exact_customers") * 0.05).as("estimate_ok"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      COUNT(DISTINCT o_custkey) AS exact_customers, TRUE AS estimate_ok
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Custom-combine contract (worker_partial_agg/coord_combine_agg
    * analogue): exact weighted average registered via functions.udaf —
    * fully oracle-checkable because the math is exact long sums. */
  private val weightedAvg = GraftQuery(
    "sketch_custom_combine_weighted_avg",
    (s, dir) => {
      val wavg = udaf(new Sketches.WeightedAvgAgg)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast(LongType).as("w"),
          (money(col("l_extendedprice")) * 100).cast(LongType).as("cents"))
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("w"), col("cents")).as("weighted_avg_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      (CAST(SUM(CAST(l_quantity AS BIGINT) *
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS DOUBLE) / SUM(CAST(l_quantity AS BIGINT))) / 100.0
        AS weighted_avg_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Approximate set INTERSECTION cardinality from HLL sketches by
    * inclusion-exclusion (|A∩B| = |A|+|B|−|A∪B|) — the standard trick
    * for sketch-rollup tables where only per-segment HLL columns are
    * stored (the citus HLL workflow, minus re-reading raw data).
    * Error compounds vs plain union, so the verdict tolerance is an
    * ABSOLUTE fraction of the union size, not of the (possibly tiny)
    * intersection. Customers with orders in BOTH status classes ≙
    * A∩B; everything distributes as grouped sketch aggregates. */
  private val hllIntersection = GraftQuery(
    "sketch_hll_intersection",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def sideEst(status: String, as: String) =
        o.filter(col("o_orderstatus") === status)
          .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))")
            .as(as))
      val unionEst = o.filter(col("o_orderstatus").isin("O", "F"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))")
          .as("est_union"))
      val exact = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey")).intersect(
          o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .agg(count(lit(1)).as("exact_both"))
      val exactU = o.filter(col("o_orderstatus").isin("O", "F"))
        .agg(countDistinct(col("o_custkey")).as("exact_union"))
      sideEst("O", "est_o").crossJoin(sideEst("F", "est_f"))
        .crossJoin(unionEst).crossJoin(exact).crossJoin(exactU)
        .select(col("exact_both"), col("exact_union"),
          (abs(col("est_o") + col("est_f") - col("est_union") -
            col("exact_both")) <= col("exact_union") * 0.05 + 1)
            .as("estimate_ok"))
    },
    Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderstatus = 'O'),
        b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderstatus = 'F')
      SELECT (SELECT CAST(COUNT(*) AS BIGINT)
              FROM a WHERE o_custkey IN (SELECT o_custkey FROM b))
            AS exact_both,
        (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
          WHERE o_orderstatus IN ('O','F')) AS exact_union,
        TRUE AS estimate_ok"""))

  override val queries: Seq[GraftQuery] =
    Seq(topn, tdigest, hllUnion, weightedAvg, hllIntersection)
}
