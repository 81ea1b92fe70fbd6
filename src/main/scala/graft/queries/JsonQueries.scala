package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON aggregate family (reference rows 7-10 of the aggregate enum:
  * json_agg / json_object_agg / jsonb_* via jsonb_cat_agg —
  * `multi_logical_optimizer.h:27-28`, tests `sql/multi_json*_agg.sql`),
  * plus set-returning functions in FROM (§2.12) and intermediate-result
  * reuse (§2.1). JSON text is built with sorted/sized ordering so the
  * output is deterministic — citus's own json_agg is input-order
  * dependent and its tests sort too.
  */
object JsonQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** json_agg: one JSON object per row, aggregated into an ordered JSON
    * array per group (to_json(struct) ≙ row_to_json). */
  private val jsonAgg = GraftQuery(
    "json_agg_rows",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .select(col("o_custkey"),
          struct(col("o_orderkey"), col("o_orderpriority")).as("rec"))
        .groupBy(col("o_custkey"))
        .agg(concat(lit("["),
          array_join(transform(array_sort(collect_list(col("rec"))),
            e => to_json(e)), ","),
          lit("]")).as("orders_json"))
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey,
      '[' || string_agg(
        json_object('o_orderkey', o_orderkey,
                    'o_orderpriority', o_orderpriority)::VARCHAR,
        ',' ORDER BY o_orderkey) || ']' AS orders_json
      FROM orders WHERE o_custkey < 20
      GROUP BY o_custkey ORDER BY o_custkey"""))

  /** json_object_agg: key→value object per group with sorted keys. */
  private val jsonObjectAgg = GraftQuery(
    "json_object_agg",
    (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(concat(lit("{"),
          array_join(transform(
            array_sort(collect_list(struct(col("n_name"), col("n_nationkey")))),
            e => concat(lit("\""), e.getField("n_name"), lit("\":"),
              e.getField("n_nationkey"))), ","),
          lit("}")).as("nations_json"))
        .orderBy(col("n_regionkey")),
    Some("""SELECT n_regionkey,
      '{' || string_agg('"' || n_name || '":' || n_nationkey,
                        ',' ORDER BY n_name) || '}' AS nations_json
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** Set-returning function in FROM (§2.12): per-row series expansion
    * (generate_series ≙ explode(sequence)). */
  private val srf = GraftQuery(
    "srf_generate_series",
    (s, dir) =>
      t(s, dir, "region")
        .select(col("r_regionkey"),
          explode(sequence(lit(0), col("r_regionkey"))).as("i"))
        .select(col("r_regionkey"), col("i"),
          (col("r_regionkey") * 10 + col("i")).as("derived"))
        .orderBy(col("r_regionkey"), col("i")),
    Some("""SELECT r_regionkey, i, r_regionkey * 10 + i AS derived
      FROM region, LATERAL (SELECT unnest(range(0, r_regionkey + 1)) AS i) u
      ORDER BY r_regionkey, i"""))

  /** Intermediate-result reuse (§2.1 read_intermediate_result /
    * recursive planning): one computed subplan cached and consumed by
    * two branches of the same query. */
  private val intermediateReuse = GraftQuery(
    "intermediate_result_reuse",
    (s, dir) => {
      val perCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .cache() // the intermediate result
      val hi = perCust.filter(col("n_orders") >= 15)
        .agg(count(lit(1)).as("n"), lit("hi").as("bucket"))
      val lo = perCust.filter(col("n_orders") < 15)
        .agg(count(lit(1)).as("n"), lit("lo").as("bucket"))
      hi.union(lo).select(col("bucket"), col("n")).orderBy(col("bucket"))
    },
    Some("""WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        GROUP BY o_custkey)
      SELECT 'hi' AS bucket, COUNT(*) AS n FROM per_cust WHERE n_orders >= 15
      UNION ALL
      SELECT 'lo' AS bucket, COUNT(*) AS n FROM per_cust WHERE n_orders < 15
      ORDER BY bucket"""))

  /** `unnest(arr) WITH ORDINALITY` (PG SRF surface): posexplode IS the
    * ordinality form — position and element in one generator pass. The
    * oracle zips DuckDB's parallel unnests (positionally aligned). */
  private val srfOrdinality = GraftQuery(
    "srf_with_ordinality",
    (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_sort(collect_list(col("n_name"))).as("names"))
        .select(col("n_regionkey"), posexplode(col("names")))
        .select(col("n_regionkey"), (col("pos") + 1).as("ord"),
          col("col").as("nation_name"))
        .orderBy(col("n_regionkey"), col("ord")),
    Some("""WITH a AS (
        SELECT n_regionkey, list_sort(list(n_name)) AS names
        FROM nation GROUP BY n_regionkey)
      SELECT n_regionkey,
        CAST(unnest(range(1, len(names) + 1)) AS INT) AS ord,
        unnest(names) AS nation_name
      FROM a ORDER BY n_regionkey, ord"""))

  override val queries: Seq[GraftQuery] =
    Seq(jsonAgg, jsonObjectAgg, srf, intermediateReuse, srfOrdinality)
}
