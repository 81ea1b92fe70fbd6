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

  /** tdigest_percentile analogue (semantic parity; approximate →
    * rows-only; tolerance asserted in SketchSpec). */
  private val tdigest = GraftQuery(
    "sketch_tdigest_percentile",
    (s, dir) => {
      val td = udaf(new Sketches.TDigestAgg(100, Seq(0.5, 0.95, 0.99)))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(td(col("l_extendedprice")).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("p50"),
          col("qs").getItem(1).as("p95"),
          col("qs").getItem(2).as("p99"))
        .orderBy(col("l_returnflag"))
    },
    None)

  /** hll_add_agg/hll_union_agg analogue with a REAL sketch column:
    * per-(status,priority) HLL sketches built with hll_sketch_agg
    * (DataSketches), then UNIONED across priorities with hll_union_agg —
    * the exact two-level pattern citus uses for distributed
    * count-distinct. Approximate → rows-only + SketchSpec tolerance. */
  private val hllUnion = GraftQuery(
    "sketch_hll_union",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
        .groupBy(col("o_orderstatus"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .as("approx_customers"))
        .orderBy(col("o_orderstatus"))
    },
    None)

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

  override val queries: Seq[GraftQuery] =
    Seq(topn, tdigest, hllUnion, weightedAvg)
}
