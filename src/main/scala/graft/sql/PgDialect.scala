package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal PostgreSQL-dialect front end (SURVEY §7 M6): rewrites the PG
  * constructs the reference's test corpus uses that Spark SQL doesn't
  * parse, then hands the query to Spark. Deliberately textual and small —
  * the scalar/aggregate semantics underneath are Spark's (the reference
  * likewise delegates all scalar execution to PostgreSQL,
  * `combine_query_planner.c:1-10`).
  *
  * Handled:
  *   - `expr::type` casts → `CAST(expr AS type)` (with PG→Spark type
  *     name mapping, e.g. int4/int8/float8/numeric/text)
  *   - `SELECT DISTINCT ON (k, ...) cols ... ORDER BY k, tiebreak` →
  *     row_number() window rewrite (PG keeps the first row per key)
  *   - PG type names in explicit CASTs
  *   - regex-match operators `~` / `!~` / `~*` / `!~*` → RLIKE
  *   - `ARRAY[...]` literals and array operators `@>` / `<@` / `&&` →
  *     array(), forall+array_contains, arrays_overlap
  */
object PgDialect {

  private val typeMap = Map(
    "int2" -> "SMALLINT", "int4" -> "INT", "int8" -> "BIGINT",
    "float4" -> "FLOAT", "float8" -> "DOUBLE",
    "numeric" -> "DECIMAL(38,18)", "text" -> "STRING",
    "varchar" -> "STRING", "bpchar" -> "STRING",
    "timestamptz" -> "TIMESTAMP", "bool" -> "BOOLEAN")

  private def mapType(t: String): String =
    typeMap.getOrElse(t.trim.toLowerCase, t.trim)

  /** `expr::type` → CAST(expr AS type). Handles chained casts
    * left-to-right; operand = literal, quoted literal, identifier,
    * or parenthesized expression. */
  def rewriteCasts(sql: String): String = {
    // the paren operand allows one nesting level, so a rewritten json
    // accessor — `(get_json_object(col, '$.k'))::int8` — still casts
    val castRe =
      """(('[^']*')|("[^"]*")|(\((?:[^()]|\([^()]*\))*\))|([A-Za-z_][A-Za-z0-9_.]*)|([0-9]+(\.[0-9]+)?))\s*::\s*([A-Za-z_][A-Za-z0-9_]*(\s*\(\s*[0-9]+(\s*,\s*[0-9]+)?\s*\))?)""".r
    var out = sql
    var changed = true
    while (changed) {
      val next = castRe.replaceAllIn(out, m => {
        val operand = m.group(1)
        val tpe = mapType(m.group(8))
        java.util.regex.Matcher.quoteReplacement(s"CAST($operand AS $tpe)")
      })
      changed = next != out
      out = next
    }
    out
  }

  /** Split on top-level commas (parens respected). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** `SELECT DISTINCT ON (keys) select-list FROM rest [ORDER BY ob]
    * [LIMIT/OFFSET tail]` → every select item aliased, row_number()
    * OVER (PARTITION BY keys ORDER BY ob) = 1 picks PG's first row
    * per key, outer query reorders and applies the LIMIT tail.
    * Handles the reference corpus's harder forms: GROUP BY/HAVING
    * underneath (the window evaluates after aggregation), positional
    * keys and ORDER BY positions (resolved against the select list),
    * aggregate/window expressions as keys, LIMIT tails. */
  def rewriteDistinctOn(sql: String): String = {
    val re =
      """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(((?:[^()]|\([^()]*\))*)\)\s*(.*?)\s+FROM\s+(.*)$""".r
    sql match {
      case re(keys, selectList, rest0) =>
        // detach ORDER BY / LIMIT / OFFSET tail at the end of `rest`
        val obRe = """(?is)(.*?)\bORDER\s+BY\b(.*)""".r
        val tailRe = """(?is)(.*?)\b(LIMIT|OFFSET)\b(.*)""".r
        val (fromPart0, obAndTail) = rest0 match {
          case obRe(f, o) => (f.trim, o.trim)
          case _ => (rest0.trim, "")
        }
        val (ob, tail, fromPart) =
          if (obAndTail.nonEmpty) obAndTail match {
            case tailRe(o, kw, t) => (o.trim, s"$kw $t".trim, fromPart0)
            case _ => (obAndTail, "", fromPart0)
          } else fromPart0 match {
            case tailRe(f, kw, t) => ("", s"$kw $t".trim, f.trim)
            case _ => ("", "", fromPart0)
          }
        // alias every select item so the outer query can re-project
        final case class Item(expr: String, alias: String)
        val identRe = """[A-Za-z_][\w.]*"""
        val asRe = s"""(?is)^(.*?)\\s+AS\\s+($identRe)\\s*$$""".r
        val items = splitTopLevel(selectList).zipWithIndex.map {
          case (it, i) => it match {
            case asRe(e, a) => Item(e.trim, a)
            case e if e.matches(identRe) => Item(e, e.split('.').last)
            case e => Item(e.trim, s"__c${i + 1}")
          }
        }
        def resolve(tok: String): String = {
          val t = tok.trim
          if (t.matches("\\d+") && t.toInt >= 1 && t.toInt <= items.size)
            items(t.toInt - 1).expr
          else t
        }
        val dirRe = """(?is)^(.*?)\s+(ASC|DESC)\s*$""".r
        def resolveOrdered(tok: String): (String, String) = tok.trim match {
          case dirRe(e, d) => (resolve(e), " " + d.toUpperCase)
          case e => (resolve(e), "")
        }
        val partKeys = splitTopLevel(keys).map(resolve)
        val windowOrder =
          (if (ob.nonEmpty) splitTopLevel(ob).map(resolveOrdered)
           else partKeys.map(_ -> ""))
            .map { case (e, d) => e + d }.mkString(", ")
        // outer ORDER BY: each item that matches a select item orders by
        // its alias; unmatched items (rare) are dropped — presentation
        // order only, the per-key pick is the window's
        val outerOb =
          if (ob.isEmpty) ""
          else {
            val mapped = splitTopLevel(ob).map(resolveOrdered).flatMap {
              case (e, d) => items.find(_.expr.equalsIgnoreCase(e))
                .map(_.alias + d)
            }
            if (mapped.isEmpty) "" else " ORDER BY " + mapped.mkString(", ")
          }
        val innerList = (items.map(p => s"${p.expr} AS ${p.alias}") :+
          (s"row_number() OVER (PARTITION BY ${partKeys.mkString(", ")} " +
            s"ORDER BY $windowOrder) AS __rn")).mkString(", ")
        s"SELECT ${items.map(_.alias).mkString(", ")} FROM " +
          s"(SELECT $innerList FROM $fromPart) WHERE __rn = 1" +
          outerOb + (if (tail.nonEmpty) " " + tail else "")
      case _ => sql
    }
  }

  /** PG limit/offset forms Spark doesn't parse: `LIMIT NULL` /
    * `LIMIT ALL` (no limit) drop, `OFFSET n LIMIT m` reorders. */
  def rewritePgLimits(sql: String): String = {
    var s = """(?i)\bLIMIT\s+(?:NULL|ALL)\b""".r.replaceAllIn(sql, "")
    s = """(?i)\bOFFSET\s+NULL\b""".r.replaceAllIn(s, "")
    s = """(?i)\bOFFSET\s+(\d+)\s+LIMIT\s+(\d+)\b""".r.replaceAllIn(s,
      m => s"LIMIT ${m.group(2)} OFFSET ${m.group(1)}")
    s
  }

  /** PG function spellings: `strpos` → `instr` (same 1-based
    * semantics), `extract(epoch from x)` → microsecond-exact epoch
    * seconds as double. */
  def rewriteFnNames(sql: String): String = {
    var s = """(?i)\bstrpos\s*\(""".r.replaceAllIn(sql, "instr(")
    s = """(?is)\bextract\s*\(\s*epoch\s+from\s+((?:[^()]|\([^()]*\))*)\)""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"(CAST(unix_micros(CAST(${m.group(1).trim} AS TIMESTAMP)) " +
          "AS DOUBLE) / 1000000.0)"))
    // PG allows rank()/dense_rank() over an UNORDERED partition (every
    // row ties at rank 1); Spark requires an order — ordering by the
    // partition keys is constant within each partition, reproducing
    // the all-ties semantics exactly
    s = """(?is)\b(rank|dense_rank)\s*\(\s*\)\s*OVER\s*\(\s*PARTITION\s+BY\s+((?:[^()]|\([^()]*\))*)\)""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)}() OVER (PARTITION BY ${m.group(2).trim} " +
          s"ORDER BY ${m.group(2).trim})"))
    s
  }

  /** PG regex-match operators: `expr ~ 'pat'` → `expr RLIKE 'pat'`,
    * `expr !~ 'pat'` → `NOT (expr RLIKE 'pat')`, case-insensitive
    * `~*` / `!~*` via an inline `(?i)` flag. Operand forms mirror
    * [[rewriteCasts]]. */
  def rewriteRegexOps(sql: String): String = {
    val opRe =
      """(('[^']*')|("[^"]*")|(\([^()]*\))|([A-Za-z_][A-Za-z0-9_.]*))\s*(!?~\*?)\s*'([^']*)'""".r
    opRe.replaceAllIn(sql, m => {
      val operand = m.group(1)
      val op = m.group(6)
      val pat = m.group(7)
      val ci = if (op.endsWith("*")) "(?i)" else ""
      val base = s"$operand RLIKE '$ci$pat'"
      java.util.regex.Matcher.quoteReplacement(
        if (op.startsWith("!")) s"NOT ($base)" else base)
    })
  }

  /** PG array operators and literals:
    *   - `ARRAY[a, b]` → `array(a, b)`
    *   - `a @> b` (contains) → `forall(b, x -> array_contains(a, x))`
    *   - `a <@ b` (contained by) → the reverse
    *   - `a && b` (overlap) → `arrays_overlap(a, b)`
    * Operands: identifiers or (rewritten) array literals. Text inside
    * single-quoted string literals is never rewritten (an `&&` in a
    * regex pattern must survive verbatim). */
  def rewriteArrayOps(sql: String): String = {
    // Mask string literals behind identifier-like placeholders so the
    // operator regexes can neither corrupt literal text nor be confused
    // by quotes inside ARRAY[...]; restore after rewriting.
    val literals = scala.collection.mutable.ArrayBuffer.empty[String]
    val masked = "'[^']*'".r.replaceAllIn(sql, m => {
      literals += m.matched
      s"__GRAFT_LIT_${literals.size - 1}__"
    })
    val lit = """ARRAY\s*\[([^\]]*)\]""".r.replaceAllIn(masked, m =>
      java.util.regex.Matcher.quoteReplacement(s"array(${m.group(1)})"))
    val operand = """((?:array\([^)]*\))|(?:[A-Za-z_][A-Za-z0-9_.]*))"""
    val opRe = (operand + """\s*(@>|<@|&&)\s*""" + operand).r
    val rewritten = opRe.replaceAllIn(lit, m => {
      val (a, op, b) = (m.group(1), m.group(2), m.group(3))
      java.util.regex.Matcher.quoteReplacement(op match {
        case "@>" => s"forall($b, __x -> array_contains($a, __x))"
        case "<@" => s"forall($a, __x -> array_contains($b, __x))"
        case _    => s"arrays_overlap($a, $b)"
      })
    })
    """__GRAFT_LIT_(\d+)__""".r.replaceAllIn(rewritten, m =>
      java.util.regex.Matcher.quoteReplacement(literals(m.group(1).toInt)))
  }

  /** PG json/jsonb extraction operators → `get_json_object` JSON
    * paths (the reference's corpus uses them as data accessors,
    * `multi_jsonb_agg.sql` flavor):
    *   - `j -> 'k'` / `j ->> 'k'` → `$.k` (field; `->>` text semantics
    *     match get_json_object's unquoting)
    *   - `j -> 0` → `$[0]` (array element)
    *   - `j #> '{a,b}'` / `j #>> '{a,b}'` → `$.a.b` (path)
    *   - chains fold into one path: `j -> 'a' ->> 'b'` → `$.a.b`
    * Base must be a plain identifier (no `::json` cast needed — JSON
    * columns here are strings). A lambda arrow (`x -> expr`) never
    * matches: these operators require a quoted key or integer index
    * on the right. */
  def rewriteJsonOps(sql: String): String = {
    val chainRe =
      """(?<![:\w'])([A-Za-z_][A-Za-z0-9_.]*)((?:\s*(?:->>|->|#>>|#>)\s*(?:'[^']*'|\d+))+)""".r
    val stepRe = """(->>|->|#>>|#>)\s*(?:'([^']*)'|(\d+))""".r
    chainRe.replaceAllIn(sql, m => {
      val base = m.group(1)
      val path = stepRe.findAllMatchIn(m.group(2)).map { sm =>
        val (op, key, idx) = (sm.group(1), sm.group(2), sm.group(3))
        if (op.startsWith("#"))
          key.stripPrefix("{").stripSuffix("}").split(',')
            .map(_.trim)
            .map(s => if (s.forall(_.isDigit)) s"[$s]" else s".$s")
            .mkString
        else if (idx != null) s"[$idx]"
        else s".$key"
      }.mkString
      java.util.regex.Matcher.quoteReplacement(
        s"get_json_object($base, '$$$path')")
    })
  }

  /** PG `ILIKE` / `NOT ILIKE` → case-folded LIKE. */
  def rewriteILike(sql: String): String = {
    val re =
      """(('[^']*')|(\([^()]*\))|([A-Za-z_][A-Za-z0-9_.]*))\s+((?i:NOT)\s+)?(?i:ILIKE)\s+('[^']*')""".r
    re.replaceAllIn(sql, m => {
      val neg = if (m.group(5) != null) "NOT " else ""
      java.util.regex.Matcher.quoteReplacement(
        s"${neg}lower(${m.group(1)}) LIKE lower(${m.group(6)})")
    })
  }

  def translate(sql: String): String =
    rewriteCasts(rewriteRegexOps(rewriteArrayOps(rewriteJsonOps(
      rewriteILike(rewritePgLimits(rewriteFnNames(
        rewriteDistinctOn(sql))))))))

  /** Translate a PG-dialect query and run it on Spark. */
  def sql(spark: SparkSession, pgSql: String): DataFrame =
    spark.sql(translate(pgSql))

  /** PG prepared-statement execution: `$1..$N` positional parameters
    * (the reference's corpus leans on PREPARE/EXECUTE —
    * multi_prepare_sql.sql) become Spark named parameter markers and
    * run through parameterized `spark.sql` — real parameter binding,
    * no string splicing, so values never need escaping. (Cast a
    * parameter with `CAST($1 AS ...)`, not `::` — the marker is not a
    * dialect-level operand.) */
  def sqlParams(spark: SparkSession, pgSql: String,
      args: Any*): DataFrame = {
    val text = translate(
      """\$(\d+)""".r.replaceAllIn(pgSql, m => ":p" + m.group(1)))
    val params = args.zipWithIndex
      .map { case (v, i) => s"p${i + 1}" -> v }.toMap
    spark.sql(text, params)
  }
}
