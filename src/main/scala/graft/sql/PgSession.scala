package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statement-level PG session state over the dialect front end:
  * PREPARE / EXECUTE / DEALLOCATE, with `$N` parameter substitution.
  *
  * The reference's prepared-statement surface
  * (`src/test/regress/sql/multi_prepare_sql.sql`; citus replans or
  * reuses the distributed plan per-execution) maps to re-translating
  * the statement text per EXECUTE here — Catalyst caches what it can;
  * at 100 TB the planning time is noise against the scan.
  *
  * Parameters substitute TEXTUALLY and then ride the normal dialect
  * path (so `$1::int` still becomes `CAST(... AS INT)`); for
  * programmatic use with real parameter BINDING (no splicing), use
  * [[PgDialect.sqlParams]] instead.
  */
class PgSession(spark: SparkSession) {
  private val prepared =
    collection.mutable.Map[String, String]()

  /** CREATE FUNCTION / CREATE AGGREGATE surface ([[UserAggregates]]):
    * session-scoped like PG's schema objects in a test schema. */
  private val userAggs = new UserAggregates.Registry

  /** Registered user-defined aggregate names (introspection). */
  def userAggregateNames: Seq[String] = userAggs.aggregateNames

  /** citus GUCs with a graft analogue: SETting them drives the
    * corresponding opt-in optimizer rule (GraftExtensions), exactly
    * as the GUC drives the reference's planner. Other SET/RESET keys
    * (search_path, client_min_messages, citus.* internals) are
    * session noise here and no-op. */
  private val gucMap = Map(
    "citus.count_distinct_error_rate" ->
      "spark.graft.countDistinctErrorRate",
    "citus.limit_clause_row_fetch_count" ->
      "spark.graft.limitApproxRowFetchCount",
    "citus.enable_repartition_joins" ->
      "spark.graft.enableRepartitionJoins")

  private val setRe =
    """(?is)^SET\s+(?:LOCAL\s+|SESSION\s+)?([\w.]+)\s*(?:TO|=)\s*(.+)$""".r
  private val resetRe = """(?is)^RESET\s+([\w.]+)\s*$""".r

  private val prepareRe =
    """(?is)^PREPARE\s+([A-Za-z_]\w*)\s*(?:\([^)]*\))?\s*AS\s+(.*)$""".r
  private val executeRe =
    """(?is)^EXECUTE\s+([A-Za-z_]\w*)\s*(?:\((.*)\))?\s*$""".r
  private val deallocRe =
    """(?is)^DEALLOCATE\s+(?:PREPARE\s+)?(ALL|[A-Za-z_]\w*)\s*$""".r

  /** Split EXECUTE arguments at top-level commas (parens and quoted
    * strings protected). */
  private def splitArgs(s: String): Seq[String] = {
    val out = collection.mutable.Buffer[String]()
    var depth = 0; var inStr = false
    val cur = new StringBuilder
    s.foreach { c =>
      c match {
        case '\'' => inStr = !inStr; cur += c
        case '(' if !inStr => depth += 1; cur += c
        case ')' if !inStr => depth -= 1; cur += c
        case ',' if !inStr && depth == 0 =>
          out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Execute one statement. Returns Some(result) for query-producing
    * statements, None for session-state statements (PREPARE,
    * DEALLOCATE). Throws for EXECUTE of an unknown statement name —
    * same as PG. */
  def execute(stmt: String): Option[DataFrame] = stmt.trim match {
    case setRe(key, value) =>
      gucMap.get(key.toLowerCase).foreach { conf =>
        val v = value.trim.stripPrefix("'").stripSuffix("'")
        if (v.equalsIgnoreCase("off")) spark.conf.set(conf, "false")
        else if (v.equalsIgnoreCase("on")) spark.conf.set(conf, "true")
        else spark.conf.set(conf, v)
      }
      None
    case resetRe(key) =>
      gucMap.get(key.toLowerCase).foreach(spark.conf.unset)
      None
    // other SET shapes (SET ROLE, SET SESSION AUTHORIZATION, ...) are
    // PG session noise with no graft analogue
    case s if s.toUpperCase.startsWith("SET ") ||
        s.toUpperCase.startsWith("RESET ") => None
    case prepareRe(name, body) =>
      prepared(name.toLowerCase) = body.trim
      None
    case executeRe(name, argText) =>
      val body = prepared.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(
          s"prepared statement \"$name\" does not exist"))
      val args = Option(argText).map(splitArgs).getOrElse(Seq.empty)
      val spliced = """\$(\d+)""".r.replaceAllIn(body, m => {
        val i = m.group(1).toInt
        if (i <= args.length)
          java.util.regex.Matcher.quoteReplacement(s"(${args(i - 1)})")
        else m.matched
      })
      Some(PgDialect.sql(spark, userAggs.rewrite(spliced)))
    case deallocRe(name) =>
      if (name.equalsIgnoreCase("ALL")) prepared.clear()
      else prepared.remove(name.toLowerCase)
      None
    case ddl if {
      // CREATE FUNCTION also registers for FROM/JOIN function-scan
      // macro expansion (side effect; UserAggregates may additionally
      // claim it as an aggregate transition function)
      if ("""(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\b""".r
          .findPrefixMatchOf(ddl.trim).isDefined)
        TableFunctions.registerFromCreate(ddl)
      userAggs.handle(ddl)
    } => None
    case other =>
      Some(PgDialect.sql(spark, userAggs.rewrite(other)))
  }

  /** The stored body of a prepared statement, if any. */
  def preparedBody(name: String): Option[String] =
    prepared.get(name.toLowerCase)
}
