package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import graft.sources.Dml
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dsl._

/** Multi-shard DML as queries: each runs the [[graft.sources.Dml]]
  * transform and surfaces the resulting relation, which the DuckDB
  * oracle reproduces with the equivalent SELECT (a MERGE is a full
  * outer join + per-row CASE; an UPDATE is a CASE projection; a DELETE
  * is a negated filter that keeps NULLs). */
object DmlQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** MERGE: price adjustments for large parts (matched → update) plus
    * backfill rows for new keys (not matched → insert). */
  private val dmlMerge = GraftQuery(
    "dml_merge",
    (s, dir) => {
      val part = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      val src = t(s, dir, "part").filter(col("p_size") >= 40)
        .select(col("p_partkey").as("k"),
          (col("p_retailprice") + lit(1.0)).as("new_price"))
        .unionAll(t(s, dir, "part").filter(col("p_size") <= 2)
          .select((col("p_partkey") + 1000000L).as("k"),
            lit(0.5).as("new_price")))
      Dml.merge(part, src, "p_partkey", "k", Dml.MergeClauses(
        matchedUpdate = Map("p_retailprice" -> col("s.new_price")),
        notMatchedInsert = Some(Map(
          "p_partkey" -> col("s.k"),
          "p_name" -> lit("backfill"),
          "p_retailprice" -> col("s.new_price")))))
    },
    Some("""WITH src AS (
        SELECT p_partkey AS k, p_retailprice + 1.0 AS new_price
        FROM part WHERE p_size >= 40
        UNION ALL
        SELECT p_partkey + 1000000 AS k, 0.5 AS new_price
        FROM part WHERE p_size <= 2)
      SELECT
        CASE WHEN t.p_partkey IS NULL THEN s.k ELSE t.p_partkey END AS p_partkey,
        CASE WHEN t.p_partkey IS NULL THEN 'backfill' ELSE t.p_name END AS p_name,
        CASE WHEN s.k IS NOT NULL THEN s.new_price
             ELSE t.p_retailprice END AS p_retailprice
      FROM part t FULL OUTER JOIN src s ON t.p_partkey = s.k"""))

  /** UPDATE lineitem SET l_discount = 0, l_quantity = l_quantity - 1
    * WHERE l_quantity > 45 — assignments read the pre-update row. */
  private val dmlUpdate = GraftQuery(
    "dml_update_where",
    (s, dir) =>
      Dml.updateWhere(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("l_discount")),
        col("l_quantity") > 45,
        Map("l_discount" -> lit(0.0),
          "l_quantity" -> (col("l_quantity") - lit(1.0)))),
    Some("""SELECT l_orderkey, l_linenumber,
        CASE WHEN l_quantity > 45 THEN l_quantity - 1.0 ELSE l_quantity END AS l_quantity,
        CASE WHEN l_quantity > 45 THEN 0.0 ELSE l_discount END AS l_discount
      FROM lineitem"""))

  /** DELETE FROM orders WHERE finished AND older than 1996. */
  private val dmlDelete = GraftQuery(
    "dml_delete_where",
    (s, dir) =>
      Dml.deleteWhere(t(s, dir, "orders"),
          col("o_orderstatus") === "F" &&
            col("o_orderdate") < ts("1996-01-01"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate")),
    Some("""SELECT o_orderkey, o_orderstatus, o_orderdate
      FROM orders
      WHERE NOT (o_orderstatus = 'F'
        AND o_orderdate < TIMESTAMP '1996-01-01')"""))

  /** Target/source pair for the ON CONFLICT queries: an "existing"
    * orders subset and an overlapping "new batch" with bumped prices
    * (keys %6==0 conflict; %2==0 and not %3==0 are fresh inserts). */
  private def conflictPair(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    (ord.filter(col("o_orderkey") % 3 === 0),
      ord.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(100.0)))
  }

  private val conflictCte = """WITH t AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderkey % 3 = 0),
      s AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0)"""

  /** INSERT..SELECT ON CONFLICT DO NOTHING: conflicting source rows are
    * dropped, fresh keys append (multi_insert_select_conflict.sql). */
  private val dmlConflictNothing = GraftQuery(
    "dml_on_conflict_nothing",
    (s, dir) => {
      val (target, source) = conflictPair(s, dir)
      Dml.insertOnConflictDoNothing(target, source, "o_orderkey")
    },
    Some(s"""$conflictCte
      SELECT * FROM t
      UNION ALL
      SELECT s.* FROM s
      WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)"""))

  /** INSERT..SELECT ON CONFLICT DO UPDATE (upsert): the proposed row's
    * price wins on conflict (PG's `excluded.o_totalprice`), fresh keys
    * insert, untouched target rows survive. */
  private val dmlConflictUpdate = GraftQuery(
    "dml_on_conflict_update",
    (s, dir) => {
      val (target, source) = conflictPair(s, dir)
      Dml.insertOnConflictDoUpdate(target, source, "o_orderkey",
        Map("o_totalprice" -> col("s.o_totalprice")))
    },
    Some(s"""$conflictCte
      SELECT t.o_orderkey, t.o_custkey,
        CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
             ELSE t.o_totalprice END AS o_totalprice
      FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
      UNION ALL
      SELECT s.o_orderkey, s.o_custkey, s.o_totalprice FROM s
      WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)"""))

  /** UPDATE ... FROM (join update against a reference table — the
    * multi-shard modify + REFERENCE_JOIN case the reference's
    * multi_modifications corpus exercises). Source is unique on the
    * join key, so the update is deterministic. */
  private val dmlUpdateFrom = GraftQuery(
    "dml_update_from",
    (s, dir) =>
      Dml.updateFrom(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority"), col("o_totalprice")),
        t(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
        col("o_custkey") % 25 === col("n_nationkey") &&
          col("o_totalprice") > 3000,
        Map("o_orderpriority" -> concat(lit("N-"), col("s.n_name")))),
    Some("""SELECT o.o_orderkey, o.o_custkey,
        CASE WHEN n.n_nationkey IS NOT NULL THEN 'N-' || n.n_name
             ELSE o.o_orderpriority END AS o_orderpriority,
        o.o_totalprice
      FROM orders o LEFT JOIN nation n
        ON o.o_custkey % 25 = n.n_nationkey AND o.o_totalprice > 3000"""))

  /** DELETE ... USING (join delete): drop lineitems supplied by
    * nation-3 suppliers — one left-anti join, broadcast source. */
  private val dmlDeleteUsing = GraftQuery(
    "dml_delete_using",
    (s, dir) =>
      Dml.deleteUsing(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"), col("l_suppkey")),
        t(s, dir, "supplier").filter(col("s_nationkey") === 3)
          .select(col("s_suppkey")),
        col("t.l_suppkey") === col("s.s_suppkey")),
    Some("""SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem
      WHERE NOT EXISTS (SELECT 1 FROM supplier
        WHERE s_nationkey = 3 AND s_suppkey = l_suppkey)"""))

  override val queries: Seq[GraftQuery] =
    Seq(dmlMerge, dmlUpdate, dmlDelete, dmlConflictNothing,
      dmlConflictUpdate, dmlUpdateFrom, dmlDeleteUsing)
}
