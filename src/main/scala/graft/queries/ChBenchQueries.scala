package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** CH-benCHmark analytical shapes from the reference's regression corpus
  * (`src/test/regress/sql/ch_benchmarks_1.sql`..`6`, `ch_bench_having.sql`)
  * adapted to the synthetic TPC-H-ish schema the way the reference adapts
  * them to its small test data (stock ≙ lineitem, oorder ≙ orders).
  *
  * The shapes that are NOT already covered by the TPC-H corpus:
  *  - scalar subqueries in both WHERE and HAVING of a grouped aggregate
  *    (`ch_bench_having.sql` — citus plans each subquery as an
  *    intermediate result, then pushes the outer aggregate);
  *  - equi-joins whose key is a computed expression, `mod((s_w_id *
  *    s_i_id), 10000) = su_suppkey` (CH Q2/Q8/Q9 — citus repartitions
  *    on the expression; Spark hashes the computed key the same way);
  *  - expression keys against a dimension + a theta residual between
  *    fact columns, `n_nationkey = ascii(substr(c_state,1,1))` with
  *    `o_entry_d <= ol_delivery_d` (CH Q8/Q10).
  *
  * All three aggregate money in exact fixed-point (Dsl.cents) so the
  * driver's hash-compare is bit-identical vs DuckDB.
  */
object ChBenchQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private val revOracle =
    """CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * CAST(round((1-l_discount)*100,0) AS BIGINT)) AS DOUBLE)/10000"""

  /** ch_bench_having.sql: scalar subqueries in WHERE and HAVING around one
    * grouped aggregate. Citus executes each subquery as an intermediate
    * result broadcast to the workers; here each 1-row aggregate is a
    * broadcast cross join — the big table is scanned and grouped in one
    * distributed pass, nothing lands on the driver. Quantities are
    * integer-valued doubles: summed as LONG so both engines are exact. */
  private val havingSubquery = GraftQuery(
    "ch_having_subquery",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val qty = round(col("l_quantity")).cast(LongType)
      // where-threshold: 0.9 × mean quantity; having-threshold: 2 × max.
      // Exact in double: integer-valued sums stay below 2^53.
      val scal = li.agg(
        (sum(qty).cast(DoubleType) / count(lit(1)) * 0.9).as("wthr"),
        (max(qty) * lit(2L)).as("hthr"))
      li.crossJoin(broadcast(scal))
        .filter(qty > col("wthr"))
        .groupBy(col("l_partkey"), col("hthr"))
        .agg(sum(qty).as("ordercount"))
        .filter(col("ordercount") > col("hthr"))
        .select(col("l_partkey"), col("ordercount"))
        .orderBy(col("l_partkey"))
    },
    Some("""WITH s AS (
        SELECT CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)/COUNT(*)*0.9 AS wthr,
               MAX(CAST(round(l_quantity) AS BIGINT))*2 AS hthr
        FROM lineitem)
      SELECT l_partkey, CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS ordercount
      FROM lineitem, s
      WHERE CAST(round(l_quantity) AS BIGINT) > s.wthr
      GROUP BY l_partkey, s.hthr
      HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > s.hthr
      ORDER BY l_partkey"""))

  /** CH Q9 shape: profit per nation per year where the lineitem→supplier
    * link is the computed key `mod(l_partkey * l_suppkey, 100)` (the CH
    * spec's `mod(s_w_id * s_i_id, 10000) = su_suppkey`). Spark shuffles
    * both sides on the computed key hash — same dual-repartition plan
    * citus builds, no nested loop. */
  private val exprJoinProfit = GraftQuery(
    "ch_expr_join_profit",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val supp = t(s, dir, "supplier")
      val nat = broadcast(t(s, dir, "nation"))
      li.join(supp, pmod(col("l_partkey") * col("l_suppkey"), lit(100L)) === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("l_year"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("sum_profit"))
        .orderBy(col("n_name"), col("l_year").desc)
    },
    Some(s"""SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS l_year,
        $revOracle AS sum_profit
      FROM lineitem, orders, supplier, nation
      WHERE (l_partkey * l_suppkey) % 100 = s_suppkey
        AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
      GROUP BY n_name, l_year
      ORDER BY n_name, l_year DESC"""))

  /** CH Q10 shape: revenue per customer where the nation link is the
    * expression key `ascii(substr(...)) = n_nationkey` and the date
    * filter has a theta residual between fact columns
    * (`o_entry_d <= ol_delivery_d`). The theta predicate stays a
    * post-join filter on the equi-joined pair — no plan blowup. */
  private val asciiThetaRevenue = GraftQuery(
    "ch_ascii_theta_revenue",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") >= ts("1996-07-01"))
      val li = t(s, dir, "lineitem")
      val nat = broadcast(t(s, dir, "nation"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey") &&
          col("o_orderdate") <= col("l_shipdate"))
        .join(nat, col("n_nationkey") ===
          pmod(ascii(substring(col("c_mktsegment"), 1, 1)), lit(25)))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name, $revOracle AS revenue
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate <= l_shipdate
        AND n_nationkey = ascii(substr(c_mktsegment,1,1)) % 25
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  def queries: Seq[GraftQuery] =
    Seq(havingSubquery, exprJoinProfit, asciiThetaRevenue)
}
