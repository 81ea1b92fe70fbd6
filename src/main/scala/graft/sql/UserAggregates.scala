package graft.sql

import scala.collection.mutable

/** PG `CREATE FUNCTION` / `CREATE AGGREGATE` surface — the
  * reference's user-defined-aggregate distribution story
  * (`multi_logical_optimizer.c:2165-2192` `AGGREGATE_CUSTOM_COMBINE`
  * via `worker_partial_agg`/`coord_combine_agg`, `:1652-1708`
  * `AGGREGATE_CUSTOM_ROW_GATHER`; corpus
  * `src/test/regress/sql/aggregate_support.sql`).
  *
  * Simple function bodies (single-`return` plpgsql, `CASE`/`IF`
  * chains, one-expression SQL functions) parse into expression
  * MACROS; a `CREATE AGGREGATE (sfunc, stype, finalfunc, initcond)`
  * then rewrites each call site into a `collect_list` +
  * `aggregate()` higher-order-function fold:
  *
  * {{{ sum2(val)  ⇒  (aggregate(collect_list(named_struct('p1', val)),
  *                     CAST('0' AS INT), (acc, e) -> acc + e.p1)) * 2 }}}
  *
  * This is the ROW_GATHER strategy expressed Spark-first: the gather
  * is per-GROUP (collect_list is itself a partial/merge aggregate —
  * rows never funnel through the driver), and the fold runs where
  * the group lands. Aggregates whose state genuinely combines
  * (sketches etc.) take the CUSTOM_COMBINE path instead as
  * `Aggregator`s via `functions.udaf` ([[graft.functions.Sketches]]).
  * PG semantics carried faithfully: STRICT transition functions skip
  * NULL-argument rows and, with a NULL initcond, seed the state from
  * the first surviving row; non-strict functions see NULLs; FILTER /
  * DISTINCT / ORDER BY forms map to a conditional collect,
  * `array_distinct`, and a sort-key-first `array_sort`.
  */
object UserAggregates {

  /** One parsed scalar function: parameter names (positional `$N`
    * normalized to `__pN`), the body as a SQL expression template,
    * and PG STRICT-ness. */
  case class FnMacro(params: Seq[String], body: String, strict: Boolean)

  /** One parsed aggregate. `builtin` carries the Spark aggregate a
    * `stype = internal` definition maps to (its transition state is
    * opaque PG internals — `int8_avg_accum` etc. — so it is matched
    * by its known finalfunc instead of interpreted). */
  case class AggSpec(name: String, argCount: Int, sfunc: String,
    stype: String, finalfunc: Option[String], initcond: Option[String],
    builtin: Option[String])

  private val typeMap = Map(
    "int" -> "INT", "int4" -> "INT", "integer" -> "INT",
    "int8" -> "BIGINT", "bigint" -> "BIGINT",
    "int2" -> "SMALLINT", "smallint" -> "SMALLINT",
    "float8" -> "DOUBLE", "double precision" -> "DOUBLE",
    "float4" -> "FLOAT", "real" -> "FLOAT",
    "numeric" -> "DECIMAL(38,6)", "decimal" -> "DECIMAL(38,6)",
    "text" -> "STRING", "varchar" -> "STRING", "bpchar" -> "STRING",
    "bool" -> "BOOLEAN", "boolean" -> "BOOLEAN",
    "date" -> "DATE", "timestamp" -> "TIMESTAMP")

  private def sparkType(pg: String): Option[String] = {
    val t = pg.trim.toLowerCase
    if (t.endsWith("[]"))
      sparkType(t.dropRight(2)).map(e => s"ARRAY<$e>")
    else typeMap.get(t)
  }

  /** `stype = internal` aggregates, recognized by finalfunc. */
  private val internalFinal = Map(
    "numeric_poly_sum" -> "sum", "numeric_poly_avg" -> "avg",
    "int8_avg" -> "avg", "numeric_sum" -> "sum", "numeric_avg" -> "avg")

  private val createFnRe =
    ("""(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+""" +
      """([A-Za-z_][\w.]*)\s*\(([^)]*)\)\s*(?:RETURNS\s+[\w ]+\s+)?(.*)$""").r
  private val dropRe =
    ("""(?is)^DROP\s+(?:AGGREGATE|FUNCTION)\s+(?:IF\s+EXISTS\s+)?""" +
      """([A-Za-z_][\w.]*)\s*.*$""").r
  private val createAggHead =
    """(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?AGGREGATE\s+([A-Za-z_][\w.]*)\s*([\s\S]*)$""".r

  private def strip(n: String): String =
    n.substring(n.lastIndexOf('.') + 1).toLowerCase

  /** Split on top-level commas — parens and single-quoted strings
    * protected. */
  private def splitTop(s: String): Seq[String] = {
    val out = mutable.Buffer[String]()
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

  /** Index of `kw` at paren depth 0 outside strings; -1 if absent. */
  private def topIndex(s: String, kw: String): Int = {
    val re = ("(?i)\\b" + kw.replace(" ", "\\s+") + "\\b").r
    var depth = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case _ if depth == 0 =>
          if (re.findPrefixMatchOf(s.substring(i)).isDefined &&
              (i == 0 || (!s.charAt(i - 1).isLetterOrDigit &&
                s.charAt(i - 1) != '_')))
            return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Whole-word, case-insensitive parameter substitution. */
  private def subst(body: String, param: String, repl: String): String =
    ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(param) +
      "(?![\\w])").r
      .replaceAllIn(body, java.util.regex.Matcher.quoteReplacement(repl))

  /** plpgsql / SQL function body → one SQL expression, or None when
    * the body is beyond the macro subset (loops, variables, ...). */
  private[sql] def bodyToExpr(body: String, language: String,
      params: Seq[String]): Option[String] = {
    var b = body.trim.stripSuffix(";").trim
    if (language == "sql") {
      b = b.replaceAll("(?is)^SELECT\\s+", "")
      // a remaining SELECT means a subquery body (ARRAY(SELECT ...))
      // — not expression-spliceable; callers fall back to resolving
      // the NAME natively
      if ("""(?i)\bselect\b""".r.findFirstIn(b).isDefined) return None
    } else { // plpgsql
      if (!b.toLowerCase.startsWith("begin")) return None
      b = b.replaceAll("(?is)^begin\\b", "")
        .replaceAll("(?is)\\bend\\s*$", "").trim
      // RAISE NOTICE/... side-channel logging has no result effect
      b = b.replaceAll("(?i)\\bRAISE\\s+(NOTICE|WARNING|INFO|DEBUG|LOG)\\s+[^;]*;", " ").trim
      if ("""(?i)\b(loop|while|declare|:=)\b""".r
          .findFirstIn(b).isDefined) return None
      b = b
        .replaceAll("(?is)\\bthen\\s+return\\s+", " THEN ")
        .replaceAll("(?is)\\belse\\s+return\\s+", " ELSE ")
        .replaceAll("(?is)\\bend\\s+case", " END")
        .replaceAll("(?is)\\bend\\s+if", " END")
        .replaceAll("(?is)^\\s*if\\b", "CASE WHEN ")
        .replaceAll("(?is)^\\s*return\\s+", "")
        .replace(";", " ")
        .trim
      if ("""(?i)\breturn\b""".r.findFirstIn(b).isDefined) return None
    }
    // positional $N → declared names
    b = """\$(\d+)""".r.replaceAllIn(b, m => {
      val i = m.group(1).toInt
      if (i <= params.length)
        java.util.regex.Matcher.quoteReplacement(params(i - 1))
      else m.matched
    })
    Some(b)
  }

  /** Session registry: parsed functions + aggregates, and the call-
    * site rewriter. One per [[PgSession]]. */
  class Registry {
    private val fns = mutable.Map[String, FnMacro]()
    private val aggs = mutable.LinkedHashMap[String, AggSpec]()

    /** Names registered (tests / introspection). */
    def aggregateNames: Seq[String] = aggs.keys.toSeq

    /** Try to consume a DDL statement; true when handled. */
    def handle(stmt: String): Boolean = stmt.trim match {
      case createFnRe(name, paramText, _) =>
        val bodyRe = """(?s)\$[A-Za-z]*\$(.*?)\$[A-Za-z]*\$""".r
        // `AS '...'` single-quoted body form ('' unescapes to ';
        // aggregate_support.sql's stfnp_zero_arg/ffp_zero_arg)
        val bodyM = bodyRe.findFirstMatchIn(stmt).map(_.group(1))
          .orElse("""(?is)\bAS\s+'((?:[^']|'')*)'""".r
            .findFirstMatchIn(stmt).map(_.group(1).replace("''", "'")))
        if (bodyM.isEmpty) return true // consumed, uninterpretable
        // attributes (STRICT, LANGUAGE) live outside the body in any
        // order — scan the whole statement with the body masked
        val attrs = bodyRe.replaceAllIn(stmt, " ")
        val strict = """(?i)\bstrict\b""".r.findFirstIn(attrs).isDefined
        val language = """(?i)\blanguage\s+(\w+)""".r
          .findFirstMatchIn(attrs).map(_.group(1).toLowerCase)
          .getOrElse("sql")
        val params = splitTop(paramText).zipWithIndex.map {
          case (p, i) =>
            val toks = p.trim.split("\\s+")
            if (toks.length >= 2 &&
              !Set("in", "out", "inout").contains(toks(0).toLowerCase))
              toks(0)
            else s"__p${i + 1}"
        }
        bodyToExpr(bodyM.get, language, params).foreach(expr =>
          fns(strip(name)) = FnMacro(params, expr, strict))
        true
      case createAggHead(name, rest) =>
        parseAggregate(strip(name), rest.trim)
        true
      case dropRe(name) =>
        aggs.remove(strip(name)); fns.remove(strip(name))
        true
      case _ => false
    }

    private def parseAggregate(name: String, rest: String): Unit = {
      // forms: `(argtypes) (options)` or `(options-with-basetype)`
      def firstGroup(s: String): Option[(String, String)] = {
        if (!s.startsWith("(")) return None
        var depth = 0
        var i = 0
        while (i < s.length) {
          s.charAt(i) match {
            case '(' => depth += 1
            case ')' =>
              depth -= 1
              if (depth == 0)
                return Some((s.substring(1, i), s.substring(i + 1).trim))
            case _ => ()
          }
          i += 1
        }
        None
      }
      firstGroup(rest).foreach { case (g1, tail) =>
        val (argText, optText) = firstGroup(tail) match {
          case Some((g2, _)) => (Some(g1), g2)
          case None => (None, g1)
        }
        val opts = splitTop(optText).flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => Some(k.trim.toLowerCase ->
              v.trim.stripPrefix("'").stripSuffix("'"))
            case _ => None
          }
        }.toMap
        val argCount = argText.map(t => splitTop(t).size)
          .orElse(opts.get("basetype").map(_ => 1)).getOrElse(1)
        val stype = opts.getOrElse("stype", "anyelement").toLowerCase
        val builtin =
          if (stype == "internal")
            opts.get("finalfunc").flatMap(f => internalFinal.get(strip(f)))
              .orElse(Some("sum"))
          else None
        // PG can OVERLOAD a built-in aggregate name per argument type
        // (`create aggregate min (coord)`); without type resolution,
        // shadowing the builtin would break every other min() call —
        // only take the name over when the state type is one we can
        // actually interpret
        val shadowsBuiltin = Set("min", "max", "sum", "avg", "count",
          "every", "stddev", "variance", "corr", "median",
          "bool_and", "bool_or", "bit_and", "bit_or").contains(name)
        val interpretable = stype == "anyelement" ||
          stype == "internal" || sparkType(stype).isDefined
        if (!(shadowsBuiltin && !interpretable))
          for (sfunc <- opts.get("sfunc"))
            aggs(name) = AggSpec(name, argCount, strip(sfunc), stype,
              opts.get("finalfunc").map(strip), opts.get("initcond"),
              builtin)
      }
    }

    /** Rewrite every registered-aggregate call site in `sql` into its
      * fold form (or builtin mapping), then expand registered SCALAR
      * function calls as macros (`square_func(5)` → `(5 * 5)`). Runs
      * BEFORE dialect translation, so remaining PG constructs in the
      * emitted text (casts in arguments, etc.) still translate. */
    def rewrite(sql: String): String = {
      val withAggs = rewriteAggs(sql)
      expandScalarFns(withAggs)
    }

    private def expandScalarFns(sql: String): String = {
      if (fns.isEmpty) return sql
      var out = sql
      var rounds = 0
      var changed = true
      while (changed && rounds < 8) { // bounded: macro bodies may nest
        rounds += 1
        changed = false
        fns.keys.toSeq.sortBy(-_.length).foreach { name =>
          val fn = fns(name)
          val callRe = ("(?is)\\b" + java.util.regex.Pattern.quote(name) +
            "\\s*\\(((?:[^()']|'[^']*'|\\((?:[^()']|'[^']*')*\\))*)\\)").r
          val next = callRe.replaceAllIn(out, m => {
            val args = splitTop(m.group(1))
            if (args.size != fn.params.size) m.matched
            else {
              var b = fn.body
              fn.params.zip(args).foreach { case (p, a) =>
                b = subst(b, p, s"($a)") }
              java.util.regex.Matcher.quoteReplacement(s"($b)")
            }
          })
          if (next != out) { changed = true; out = next }
        }
      }
      out
    }

    private def rewriteAggs(sql: String): String = {
      if (aggs.isEmpty) return sql
      var out = sql
      val nested =
        """((?:[^()']|'[^']*'|\((?:[^()']|'[^']*'|\([^()]*\))*\))*)"""
      aggs.keys.toSeq.sortBy(-_.length).foreach { name =>
        val spec = aggs(name)
        val callRe = ("(?is)\\b" + java.util.regex.Pattern.quote(name) +
          "\\s*\\(" + nested + "\\)" +
          "(?:\\s*filter\\s*\\(\\s*where\\s+" + nested + "\\))?").r
        var changed = true
        while (changed) {
          val next = callRe.replaceAllIn(out, m =>
            java.util.regex.Matcher.quoteReplacement(
              expand(spec, m.group(1), Option(m.group(2)))))
          changed = next != out
          out = next
        }
      }
      out
    }

    private def expand(spec: AggSpec, rawArgs: String,
        filter: Option[String]): String = {
      // leading DISTINCT / trailing top-level ORDER BY inside the call
      var argText = rawArgs.trim
      val distinct = """(?is)^DISTINCT\b""".r
        .findFirstIn(argText).isDefined
      if (distinct)
        argText = argText.replaceFirst("(?is)^DISTINCT\\s+", "")
      val obIdx = topIndex(argText, "ORDER BY")
      val orderBy = if (obIdx >= 0) {
        val ob = argText.substring(obIdx + "ORDER BY".length).trim
        argText = argText.substring(0, obIdx).trim
        // ascending keys only (the corpus's forms); strip ASC noise
        Some(splitTop(ob).map(_.replaceAll("(?i)\\s+asc\\b", "").trim))
      } else None
      // zero-argument `agg(*)` (PG's CREATE AGGREGATE name(*); the
      // polymorphic battery in aggregate_support.sql:658-666): the
      // transition sees only the state, once per row — collect a
      // constant per row so the fold still iterates row-count times
      val args =
        if (argText == "*" || argText.isEmpty) Seq("1")
        else splitTop(argText)

      spec.builtin.foreach { b =>
        // internal-state aggregate: known Spark equivalent; FILTER is
        // native Spark syntax
        val f = filter.map(p => s" FILTER (WHERE $p)").getOrElse("")
        return s"$b(${args.mkString(", ")})$f"
      }

      // transition fns that aren't registered macros are PG built-ins;
      // most of the ones aggregates use (array_append, array_cat,
      // concat, greatest, ...) exist in Spark under the same name —
      // emit a direct call and let Spark resolve it
      val sfn = fns.getOrElse(spec.sfunc, {
        val ps = "s" +: (1 to spec.argCount).map(i => s"x$i")
        FnMacro(ps, s"${spec.sfunc}(${ps.mkString(", ")})",
          strict = false)
      })
      val strict = sfn.strict
      val stypeSpark = sparkType(spec.stype)
      def cast(e: String): String =
        stypeSpark.map(t => s"CAST($e AS $t)").getOrElse(e)

      // ---- combinable fast paths (r13, optimization guide §4) --------
      // The row-gather fold below is exact for ANY transition fn but
      // costs a per-group collect_list (+ array_sort for ORDER BY) —
      // measured 5.6 s on the 600k-row corpus probe. Two transition
      // SHAPES cover the hot aggregates and map to native, combinable
      // Spark aggregates (partial/final split, no gather), with PG's
      // strict/initcond semantics reproduced exactly (the
      // ExtensionSpec battery pins them):
      //   `state + x` → sum(x); exact only for order-free state types
      //     (integers/decimal — double sums reorder), ORDER BY
      //     ignorable by commutativity; non-strict folds poison the
      //     state on a NULL input (0 + NULL = NULL forever), so that
      //     form keeps a count(1)>count(x) NULL guard; strict skips
      //     NULLs like sum does, with initcond as the empty fallback.
      //     Known divergence ON OVERFLOW ONLY (ADVICE r13, documented
      //     deliberately): for a DECIMAL(p,s) stype the fold casts the
      //     state back to DECIMAL(p,s) after EVERY step, so a running
      //     sum that transiently exceeds p digits yields NULL and
      //     poisons the group, while sum(x) accumulates at widened
      //     precision and only the FINAL cast can overflow — on inputs
      //     whose partial sums overflow but whose total fits, the fast
      //     path returns the value where the fold returned NULL. The
      //     fast path matches PG (numeric carries effectively unbounded
      //     precision mid-aggregation; a PG CREATE AGGREGATE over
      //     numeric never overflows mid-fold), so it is kept; the
      //     corpus cannot reach either behavior (sums ≪ 10^p).
      //   `state` (keep-first) + STRICT + ORDER BY → the first
      //     non-null value by the sort keys = min_by over the
      //     (sort keys, value) tuple — the same tuple array_sort
      //     orders in the fold (value as final tiebreak).
      // DISTINCT and every other shape fall through to the fold.
      val normBody = sfn.body.replaceAll("[\\s()]", "").toLowerCase
      val pState = sfn.params.head.toLowerCase
      val pArgs = sfn.params.drop(1).map(_.toLowerCase)
      val orderFreeState = stypeSpark.exists(t =>
        Set("INT", "BIGINT", "SMALLINT")(t) || t.startsWith("DECIMAL"))
      val initTrim = spec.initcond.map(_.trim)
      val fastSum: Option[String] =
        if (spec.argCount == 1 && pArgs.size == 1 && !distinct &&
            orderFreeState &&
            (normBody == s"$pState+${pArgs.head}" ||
              normBody == s"${pArgs.head}+$pState") &&
            initTrim.forall(_ == "0") &&
            (strict || initTrim.contains("0"))) {
          val x = args.head
          val f = filter.map(p => s" FILTER (WHERE $p)").getOrElse("")
          val sumX = s"sum($x)$f"
          Some(
            if (strict) initTrim match {
              case Some(_) => s"coalesce(${cast(sumX)}, ${cast("0")})"
              case None    => cast(sumX)
            } else
              s"CASE WHEN count(1)$f > count($x)$f " +
                s"THEN ${cast("NULL")} " +
                s"ELSE coalesce(${cast(sumX)}, ${cast("0")}) END")
        } else None
      val fastFirst: Option[String] =
        if (fastSum.isEmpty && spec.argCount == 1 && !distinct &&
            normBody == pState && strict && spec.initcond.isEmpty &&
            orderBy.exists(_.nonEmpty) && stypeSpark.isDefined) {
          val x = args.head
          val keyFields = orderBy.get.zipWithIndex
            .map { case (k, i) => s"'__k$i', $k" } :+ s"'__v', $x"
          val conds = s"($x) IS NOT NULL" +:
            filter.map(p => s"($p)").toSeq
          Some(s"min_by(${cast(s"($x)")}, " +
            s"named_struct(${keyFields.mkString(", ")})) " +
            s"FILTER (WHERE ${conds.mkString(" AND ")})")
        } else None

      // the collected element: sort keys FIRST so array_sort orders by
      // them, then the argument fields p1..pn
      val sortFields = orderBy.getOrElse(Seq.empty).zipWithIndex
        .map { case (k, i) => s"'__k$i', $k" }
      val argFields = args.zipWithIndex
        .map { case (a, i) => s"'p${i + 1}', $a" }
      val elem =
        s"named_struct(${(sortFields ++ argFields).mkString(", ")})"
      val conds = filter.map(p => s"($p)").toSeq ++
        (if (strict) args.map(a => s"($a) IS NOT NULL") else Seq.empty)
      var arr =
        if (conds.isEmpty) s"collect_list($elem)"
        else s"collect_list(CASE WHEN ${conds.mkString(" AND ")} " +
          s"THEN $elem END)"
      if (orderBy.isDefined) arr = s"array_sort($arr)"
      if (distinct) arr = s"array_distinct($arr)"

      // the transition lambda: state → acc, declared params → fields
      var lam = sfn.body
      sfn.params.zipWithIndex.foreach { case (p, i) =>
        lam = subst(lam, p, if (i == 0) "acc" else s"e.p$i")
      }
      val lambda = s"(acc, e) -> ${cast(s"($lam)")}"

      val fold = fastSum.orElse(fastFirst).getOrElse(spec.initcond match {
        case Some(init) =>
          // PG array literal initcond ('{}') → empty array
          val lit = if (init.trim == "{}") "array()" else s"'$init'"
          s"aggregate($arr, ${cast(lit)}, $lambda)"
        case None if strict =>
          // PG: strict sfunc + NULL initcond seeds state from the
          // first (non-null) input value
          s"CASE WHEN size($arr) = 0 THEN ${cast("NULL")} " +
            s"ELSE aggregate(slice($arr, 2, size($arr) - 1), " +
            s"${cast(s"element_at($arr, 1).p1")}, $lambda) END"
        case None =>
          // polymorphic (anyelement) state: NULL must carry the
          // element's type — if(false, e, NULL) is a typed NULL
          val init = stypeSpark.map(t => s"CAST(NULL AS $t)")
            .getOrElse(s"if(false, element_at($arr, 1).p1, NULL)")
          s"aggregate($arr, $init, $lambda)"
      })

      spec.finalfunc match {
        case Some(f) => fns.get(f) match {
          case Some(fin) =>
            s"(${subst(fin.body, fin.params.head, s"($fold)")})"
          // unregistered finalfunc: a PG built-in — call it directly
          // (array_sort, ...), Spark resolves the shared names
          case None => s"($f($fold))"
        }
        case None => s"($fold)"
      }
    }
  }
}
