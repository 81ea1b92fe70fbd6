package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query modules. Each GraftQuery carries its Spark implementation
    * plus (when SQL-expressible) the DuckDB oracle SQL. */
  private def modules: Seq[QueryModule] = Seq(
    TpchQueries, TpchDeepQueries, ChBenchQueries, AggQueries, JoinQueries, WindowQueries,
    SetOpQueries, SubqueryQueries, ScalarQueries, TextQueries,
    SimilarityQueries, SketchQueries, EventQueries, MultimodalQueries,
    JsonQueries, PgExtraQueries, DmlQueries)

  lazy val all: Seq[GraftQuery] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Headline subset timed by Bench. */
  def benchQueries: Seq[String] = all.filter(_.bench).map(_.name)
}
