package graft

import org.apache.spark.sql.SparkSession

/** The library's front door — what a user of the reference switches to.
  *
  * One import, one session builder, and every subsystem reachable from
  * here (each is its own object so nothing loads until touched):
  *
  * {{{
  * import graft.Graft
  * val spark = Graft.session()                  // tuned local session
  *
  * // data model (≙ create_distributed_table / create_reference_table)
  * Graft.catalog.createDistributedTable(spark, df, "fact", "key")
  * Graft.catalog.createReferenceTable(spark, dims, "dim")
  * Graft.catalog.shardSizes(spark, "fact")      // ≙ citus_shards
  *
  * // DML (≙ MERGE / multi-shard UPDATE / DELETE)
  * Graft.dml.mergeIntoTable(spark, "fact", changes, "key")
  *
  * // pipelines
  * Graft.dedup.minhashCandidates(docs, "id", "text")
  * Graft.similarity.bruteForceTopK(vecs, "id", "emb", query, 10)
  * Graft.asof.asofBackward(clicks, buys, Seq("uid"), "ts", "ts", Seq("ts"))
  * Graft.skew.saltedEquiJoin(big, dim, "key", salt = 16)
  * Graft.topK(df, Seq(col("grp")), Seq(col("score").desc), k = 3)
  * }}}
  *
  * SQL users: `session()` installs [[plans.GraftExtensions]], so
  * `simhash64`, `cosine_sim`, `jaccard_sim` are SQL functions, reference
  * tables auto-broadcast, and the approximation GUC analogues
  * (`spark.graft.countDistinctErrorRate`,
  * `spark.graft.limitApproxRowFetchCount`) are live. PG-dialect SQL
  * (`::` casts, DISTINCT ON, `~` operators) runs via [[Graft.pgSql]].
  */
object Graft {

  /** Session with the engine's extensions and scale-sane defaults
    * installed (shuffle partitions should still be sized to data —
    * see Bench for the auto-sizing rule). */
  def session(master: String = "local[*]", appName: String = "graft")
      : SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()

  val catalog: graft.catalog.DistributionCatalog.type =
    graft.catalog.DistributionCatalog
  val ingest: graft.sources.Ingest.type = graft.sources.Ingest
  val dml: graft.sources.Dml.type = graft.sources.Dml
  val dedup: graft.operators.Dedup.type = graft.operators.Dedup
  val similarity: graft.operators.Similarity.type = graft.operators.Similarity
  val asof: graft.operators.AsOfJoin.type = graft.operators.AsOfJoin
  val skew: graft.operators.SkewJoin.type = graft.operators.SkewJoin
  val streaming: graft.streaming.StreamingOps.type =
    graft.streaming.StreamingOps
  val multimodal: graft.multimodal.Multimodal.type =
    graft.multimodal.Multimodal

  /** Exact top-k per group on the custom whole-operator plan. */
  def topK(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[org.apache.spark.sql.Column],
      orderCols: Seq[org.apache.spark.sql.Column], k: Int)
      : org.apache.spark.sql.DataFrame =
    plans.TopKPerGroup(df, groupCols, orderCols, k)

  val rangeJoin: graft.operators.RangeJoin.type = graft.operators.RangeJoin

  /** Run PG-dialect SQL (:: casts, DISTINCT ON, ~ operators, ARRAY ops). */
  def pgSql(spark: SparkSession, pg: String): org.apache.spark.sql.DataFrame =
    sql.PgDialect.sql(spark, pg)

  /** Distributed-EXPLAIN report: one row per strategy-relevant physical
    * node (scans + pushdown, shuffles, broadcast vs shuffle joins,
    * aggregates) — the EXPLAIN surface of `multi_explain.c` as data. */
  def explainReport(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    plans.PlanChecks.explainReport(df)

  val rebalancer: graft.catalog.Rebalancer.type = graft.catalog.Rebalancer

  /** `citus_stat_statements` analogue — install on a session, read the
    * per-statement stats view, reset. */
  val stats: graft.plans.QueryStats.type = graft.plans.QueryStats

  /** PG-dialect SQL with `$1..$N` positional parameters bound through
    * Spark's parameterized sql (PREPARE/EXECUTE analogue). */
  def pgSqlParams(spark: SparkSession, pg: String, args: Any*)
      : org.apache.spark.sql.DataFrame =
    sql.PgDialect.sqlParams(spark, pg, args: _*)

  /** EXPLAIN ANALYZE: run the plan and report measured per-node
    * metrics (`worker_save_query_explain_analyze` analogue). */
  def explainAnalyze(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    plans.PlanChecks.explainAnalyze(df)
}
