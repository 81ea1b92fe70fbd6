package graft.sql

/** PG function scans in FROM/JOIN position.
  *
  * The reference plans `SELECT * FROM table1 JOIN add(3,5) sum ON ...`
  * by wrapping the function call in a `(SELECT * FROM fnc())` subquery
  * and shipping it to the workers (reference:
  * `src/backend/distributed/planner/function_call_delegation.c:1-11`,
  * `src/test/regress/sql/multi_function_in_join.sql`). The Spark-first
  * analogue is macro expansion at the dialect layer: a registered SQL
  * (or simple-plpgsql) function body is inlined as a derived table
  * with the PG column-naming rules —
  *
  *   - scalar return: the call-site alias names the single column
  *     (`JOIN add(3,5) sum ON (id = sum)` → `(SELECT 3+5) AS
  *     sum(sum)`);
  *   - `RETURNS TABLE(...)` / OUT parameters: the declared names;
  *   - `SETOF RECORD`: the call site's column-definition list
  *     (`AS t2(x int, y int)`);
  *   - composite-type return: the body's own aliases.
  *
  * Expansion happens BEFORE the rest of the dialect pipeline, so
  * bodies may use any PG spelling the dialect supports
  * (generate_series, `||`, casts, ...). At scale the inlined body is
  * just more of the same declarative plan — Catalyst sees through the
  * derived table, so a scalar function body is a one-row broadcast
  * side, never a per-row call.
  *
  * The registry is session-global (like PG schema objects in a test
  * schema); `clear()` between corpus replays.
  */
object TableFunctions {

  /** One registered function: `params` are IN parameters in order
    * (name may be empty for positional-only `$N` bodies, with an
    * optional DEFAULT expression); `outCols` are declared output
    * column names (TABLE(...) / OUT); `scalar` marks a simple-type
    * return whose single column the call-site alias renames. */
  final case class FnDef(
      name: String,
      params: Seq[(String, Option[String])],
      body: String,
      outCols: Seq[String],
      scalar: Boolean)

  /** name → overloads (PG functions overload by arity; a 0-arg and a
    * 1-arg definition of the same name coexist — arbitrary_configs_
    * router_create.sql's author_articles_* pairs). */
  private val fns =
    scala.collection.concurrent.TrieMap[String, List[FnDef]]()

  /** The overload for a call with `nArgs` arguments: exact arity
    * first, then the smallest definition whose missing trailing
    * parameters all carry DEFAULTs. */
  private def resolve(nm: String, nArgs: Int): Option[FnDef] =
    fns.get(nm).flatMap { cands =>
      cands.find(_.params.length == nArgs)
        .orElse(cands
          .filter(fd => fd.params.length > nArgs &&
            fd.params.drop(nArgs).forall(_._2.isDefined))
          .sortBy(_.params.length).headOption)
    }

  /** Built-in scalar functions that may legally appear as a function
    * scan (`JOIN abs(100) AS hundred`): expanded as one-row selects. */
  private val builtinScalar = Set("abs", "upper", "lower", "length",
    "sqrt", "floor", "ceil", "ceiling", "round")

  def register(fd: FnDef): Unit = {
    val k = fd.name.toLowerCase
    fns(k) = fd :: fns.getOrElse(k, Nil)
      .filterNot(_.params.length == fd.params.length)
  }
  def registered: Set[String] = fns.keySet.toSet
  def clear(): Unit = fns.clear()

  private val scalarTypes = Set("int", "integer", "int2", "int4",
    "int8", "bigint", "smallint", "serial", "bigserial", "text",
    "varchar", "char", "character", "numeric", "decimal", "boolean",
    "bool", "date", "timestamp", "timestamptz", "time", "float",
    "float4", "float8", "real", "double", "regclass", "void")

  private def isTypeWord(w: String): Boolean =
    scalarTypes.contains(w.toLowerCase)

  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var depth = 0; var inQ = false
    val cur = new StringBuilder
    s.foreach { c =>
      if (inQ) { cur += c; if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case other => cur += other
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one `CREATE [OR REPLACE] FUNCTION name(params) RETURNS ...
    * AS <body> LANGUAGE sql|plpgsql` statement and register it when
    * the body is an expressible SQL form. Returns true when
    * registered. Honest residuals: plpgsql bodies beyond `RETURN
    * expr` / `RETURN QUERY select` / `SELECT INTO var items FROM ...;
    * RETURN var` stay unregistered (their call sites then fail
    * exactly as unsupported surface should). */
  def registerFromCreate(stmt0: String): Boolean = {
    val stmt = stmt0.trim
    val headRe =
      ("""(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+""" +
        """([A-Za-z_][\w.]*)\s*\(""").r
    val m = headRe.findFirstMatchIn(stmt).getOrElse(return false)
    val name = {
      val n = m.group(1)
      n.substring(n.lastIndexOf('.') + 1).toLowerCase
    }
    // matching close paren of the parameter list
    var depth = 1; var i = m.end
    while (depth > 0 && i < stmt.length) {
      stmt.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    if (depth != 0) return false
    val paramText = stmt.substring(m.end, i - 1)
    val tail = stmt.substring(i)

    // parameters: [IN|OUT|INOUT|VARIADIC] [name] type [DEFAULT e | = e]
    var inParams = Seq.empty[(String, Option[String])]
    var outNames = Seq.empty[String]
    splitTop(paramText).foreach { it0 =>
      val (mode, it) = {
        val mRe = """(?is)^(IN|OUT|INOUT|VARIADIC)\s+(.*)$""".r
        it0.trim match {
          case mRe(md, rest) => (md.toUpperCase, rest.trim)
          case other => ("IN", other)
        }
      }
      val (rest, default) = {
        val dRe = """(?is)^(.*?)\s+DEFAULT\s+(.+)$""".r
        val eRe = """(?is)^(.*?)\s*=\s*(.+)$""".r
        it match {
          case dRe(r, d) => (r.trim, Some(d.trim))
          case eRe(r, d) => (r.trim, Some(d.trim))
          case other => (other, None)
        }
      }
      val words = rest.split("\\s+", 2)
      val pname =
        if (words.length >= 2 && !isTypeWord(words(0))) words(0).toLowerCase
        else "" // positional-only ($N in the body)
      mode match {
        case "OUT" => outNames :+= (if (pname.nonEmpty) pname else "column1")
        case "INOUT" =>
          inParams :+= (pname -> default); outNames :+= pname
        case _ => inParams :+= (pname -> default)
      }
    }

    // RETURNS clause → output shape
    val retTableRe = """(?is)\bRETURNS\s+(?:SETOF\s+)?TABLE\s*\(""".r
    val retRe = """(?is)\bRETURNS\s+(SETOF\s+)?([A-Za-z_][\w ]*)""".r
    var outCols = outNames
    var scalar = false
    retTableRe.findFirstMatchIn(tail) match {
      case Some(tm) =>
        var d = 1; var j = tm.end
        while (d > 0 && j < tail.length) {
          tail.charAt(j) match {
            case '(' => d += 1
            case ')' => d -= 1
            case _ => ()
          }
          j += 1
        }
        outCols = splitTop(tail.substring(tm.end, j - 1))
          .map(_.split("\\s+")(0).toLowerCase)
      case None =>
        retRe.findFirstMatchIn(tail).foreach { rm =>
          val t = rm.group(2).trim.split("\\s+")(0).toLowerCase
          if (t == "record") () // call-site column definitions
          else if (isTypeWord(t)) { if (outCols.isEmpty) scalar = true }
          else () // composite type: body aliases name the columns
        }
    }

    // body: $tag$...$tag$ or a single-quoted literal after AS
    val body0 =
      """(?s)\$([A-Za-z]*)\$(.*?)\$\1\$""".r.findFirstMatchIn(tail)
        .map(_.group(2)).orElse {
        """(?is)\bAS\s+'(.*?)'\s*(?:LANGUAGE|$)""".r
          .findFirstMatchIn(tail).map(_.group(1).replace("''", "'"))
      }.getOrElse(return false).trim
    val isPlpgsql =
      """(?is)LANGUAGE\s+'?plpgsql'?""".r.findFirstIn(tail).isDefined

    val sqlBody: String =
      if (!isPlpgsql) {
        val b = body0.stripSuffix(";").trim
        if (b.toUpperCase.startsWith("SELECT") ||
          b.toUpperCase.startsWith("WITH") ||
          b.toUpperCase.startsWith("VALUES")) b
        else return false
      } else {
        val retQueryRe =
          """(?is)BEGIN\s+RETURN\s+QUERY\s+(.*?);\s*END""".r
        val selIntoRe =
          ("""(?is)\bSELECT\s+INTO\s+\w+\s+(.*?);\s*""" +
            """RETURN\s+\w+\s*;""").r
        // trailing-INTO spelling: SELECT <items> FROM ... INTO var;
        // RETURN var; — the SELECT without the INTO is the body
        val tailIntoRe =
          ("""(?is)BEGIN\s+(SELECT\b.*?)\s+INTO\s+(\w+)\s*;\s*""" +
            """RETURN\s+\2\s*;""").r
        val retExprRe = """(?is)BEGIN\s+RETURN\s+(.*?);\s*END""".r
        // RAISE NOTICE/DEBUG/... are side-effect-free logging — strip
        // them so `BEGIN RAISE ...; RETURN expr; END` bodies register
        // (multi_function_evaluation.sql's stable_fn/stable_squared)
        val bodyClean0 =
          """(?is)\bRAISE\s+(NOTICE|DEBUG|LOG|INFO|WARNING)\s+[^;]*;\s*""".r
            .replaceAllIn(body0, "")
        // a DECLARE block before BEGIN only names locals — the INTO
        // patterns below recover the value flow (nested_execution's
        // `DECLARE result bigint; BEGIN SELECT ... INTO result ...`)
        val bodyClean = """(?is)^\s*DECLARE\b.*?\bBEGIN\b""".r
          .replaceAllIn(bodyClean0, "BEGIN")
        // mid-statement INTO: `SELECT <items> INTO var FROM ...;
        // RETURN var;` — the SELECT without the INTO is the body
        val midIntoRe =
          ("""(?is)BEGIN\s+SELECT\s+(.*?)\s+INTO\s+(\w+)\s+""" +
            """(FROM\b.*?);\s*RETURN\s+\2\s*;""").r
        retQueryRe.findFirstMatchIn(bodyClean).map(_.group(1).trim)
          .orElse(midIntoRe.findFirstMatchIn(bodyClean)
            .map(mm => s"SELECT ${mm.group(1).trim} ${mm.group(3).trim}"))
          .orElse(selIntoRe.findFirstMatchIn(bodyClean)
            .map(mm => "SELECT " + mm.group(1).trim))
          .orElse(tailIntoRe.findFirstMatchIn(bodyClean)
            .map(_.group(1).trim))
          .orElse(retExprRe.findFirstMatchIn(bodyClean).map { mm =>
            var e = mm.group(1).trim
            // PG `/` between integers TRUNCATES (plpgsql
            // `theValue * 3 / 2 + 1`, multi_schema_support.sql's
            // dummyFunction): when every declared parameter is
            // integer-typed and the expression is pure integer
            // arithmetic, compile `/` to Spark's integral `div`
            val ps = splitTop(paramText)
            val intParams = ps.nonEmpty && ps.forall(p =>
              """(?i)\b(int(eger|[248])?|smallint|bigint|serial)\b""".r
                .findFirstIn(p).isDefined)
            // every identifier in the expression must BE a declared
            // integer parameter (r11 ADVICE): a DECLAREd numeric
            // local or any other name passes the charset check but
            // is not integer-typed — truncating it would be wrong
            val paramNames = ps.flatMap { p =>
              val toks = p.trim.split("\\s+")
              if (toks.length >= 2) Some(toks(0).toLowerCase) else None
            }.toSet
            val idents = """[A-Za-z_]\w*""".r.findAllIn(e)
              .map(_.toLowerCase).toSet
            if (intParams && idents.subsetOf(paramNames) &&
                e.contains("/") && !e.contains(".") &&
                """^[A-Za-z0-9_\s+\-*/%()]*$""".r.findFirstIn(e)
                  .contains(e))
              e = e.replace("/", " div ")
            "SELECT (" + e + ")"
          })
          .orElse {
            // plpgsql OUT-parameter assignment bodies (row_types.sql's
            // `record_returner(INOUT id int, OUT name text)` with
            // `id := id + 1; name := 'returned';`): every statement
            // assigns an OUT/INOUT param — the composite result is
            // the OUT params in declaration order; an unassigned
            // INOUT keeps its input value (the param name, which
            // substitute() splices with the argument)
            val allAsgRe = ("""(?is)^\s*BEGIN\s+""" +
              """((?:[A-Za-z_]\w*\s*:=\s*[^;]+;\s*)+)END\s*;?\s*$""").r
            allAsgRe.findFirstMatchIn(bodyClean).flatMap { mm =>
              val asg = """(?s)([A-Za-z_]\w*)\s*:=\s*([^;]+);""".r
                .findAllMatchIn(mm.group(1))
                .map(a => a.group(1).toLowerCase -> a.group(2).trim)
                .toList
              val byVar = asg.groupBy(_._1).view
                .mapValues(_.last._2).toMap
              if (outNames.nonEmpty &&
                  byVar.keySet.subsetOf(outNames.map(_.toLowerCase).toSet))
                Some(
                  if (outNames.size == 1)
                    "SELECT (" +
                      byVar.getOrElse(outNames.head.toLowerCase,
                        outNames.head) + ")"
                  else "SELECT struct(" + outNames.map(o =>
                    byVar.getOrElse(o.toLowerCase, o))
                    .mkString(", ") + ")")
              else None
            }
          }
          .getOrElse(return false)
      }

    register(FnDef(name, inParams, sqlBody, outCols, scalar))
    true
  }

  /** Splice call-site arguments into the body: `$N` positionally and
    * named parameters by word-boundary substitution (parenthesized).
    * Missing trailing arguments take their DEFAULTs; no default →
    * None (call site left unexpanded). */
  private def substitute(fd: FnDef, args: Seq[String]): Option[String] = {
    val vals = fd.params.zipWithIndex.map { case ((_, dflt), i) =>
      if (i < args.length) args(i)
      else dflt.getOrElse(return None)
    }
    // simple literals/identifiers splice bare (keeps downstream
    // pattern rewrites like generate_series(...) matchable); compound
    // expressions get protective parens
    def spliced(v: String): String =
      if (v.matches("""(?s)^-?[\w.']+$""")) v else s"($v)"
    var b = """\$(\d+)""".r.replaceAllIn(fd.body, mm => {
      val i = mm.group(1).toInt - 1
      if (i < vals.length)
        java.util.regex.Matcher.quoteReplacement(spliced(vals(i)))
      else mm.matched
    })
    fd.params.zipWithIndex.foreach { case ((pn, _), i) =>
      if (pn.nonEmpty)
        b = ("""(?i)(?<![\w.$])""" + pn + """\b""").r
          .replaceAllIn(b, java.util.regex.Matcher
            .quoteReplacement(spliced(vals(i))))
    }
    Some(b)
  }

  /** Build the derived-table replacement for one call. */
  private def expandCall(fd: FnDef, args: Seq[String], alias: String,
      siteCols: Seq[String]): Option[String] = {
    val body = substitute(fd, args).getOrElse(return None)
    val colList =
      if (siteCols.nonEmpty) siteCols
      else if (fd.outCols.nonEmpty) fd.outCols
      else if (fd.scalar) Seq(alias)
      else Nil
    val cols = if (colList.isEmpty) "" else colList.mkString("(", ", ", ")")
    Some(s"($body) AS $alias$cols")
  }

  /** Does the (masked) body contain a top-level FROM? Bodies with FROM
    * are relations, not inlinable scalar expressions. */
  private def hasTopLevelFrom(body: String): Boolean = {
    val masked = maskLiterals(body).toUpperCase
    var depth = 0; var i = 0
    while (i < masked.length) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && masked.startsWith("FROM", i) &&
            (i == 0 || { val c = masked.charAt(i - 1)
              !c.isLetterOrDigit && c != '_' }) &&
            (i + 4 >= masked.length || { val c = masked.charAt(i + 4)
              !c.isLetterOrDigit && c != '_' }))
            return true
      }
      i += 1
    }
    false
  }

  /** PG SQL-function INLINING (the planner's `inline_function`
    * analogue, src/backend/optimizer/util/clauses.c in PG): a
    * registered SCALAR function inlines at any remaining call site —
    * WHERE, select list, join conditions: a bare no-FROM SELECT body
    * becomes a parenthesized expression with arguments substituted; a
    * body WITH a FROM becomes a scalar subquery (same single-value
    * contract). Runs AFTER function-scan expansion, so FROM/JOIN sites
    * are already derived tables; the skipped sites are function scans
    * (FROM/JOIN/LATERAL/comma-of-FROM positions), WITH ORDINALITY
    * scans, and bodies that are volatile
    * (random/now/uuid — inlining would change per-row evaluation
    * semantics). */
  private def inlineScalarCalls(sql0: String): String = {
    var out = sql0
    var guard = 0
    var changed = true
    val volatileRe = """(?i)\b(random|rand|now|uuid)\s*\(""".r
    while (changed && guard < 50) {
      changed = false
      guard += 1
      val masked = maskLiterals(out)
      def closeParen(start: Int): Int = {
        var d = 1; var i = start
        while (d > 0 && i < out.length) {
          masked.charAt(i) match {
            case '(' => d += 1
            case ')' => d -= 1
            case _ => ()
          }
          i += 1
        }
        i
      }
      // Which clause encloses position `pos` at its own paren depth?
      // Tracked as a per-depth stack so `FROM t, fn(x)` (a comma-
      // separated function scan, valid PG) is recognized as a scan
      // site even though no FROM/JOIN keyword directly precedes it.
      def inFromClause(pos: Int): Boolean = {
        val up = masked.toUpperCase
        val kws = Set("SELECT", "FROM", "WHERE", "GROUP", "HAVING",
          "ORDER", "LIMIT", "ON", "SET", "VALUES")
        val stack = scala.collection.mutable.Stack[String]()
        var cur = ""
        var i = 0
        while (i < pos) {
          val c = up.charAt(i)
          if (c == '(') { stack.push(cur); cur = ""; i += 1 }
          else if (c == ')') {
            cur = if (stack.nonEmpty) stack.pop() else ""; i += 1
          } else if (c.isLetter &&
            (i == 0 || { val p = up.charAt(i - 1)
              !p.isLetterOrDigit && p != '_' && p != '.' })) {
            var k = i
            while (k < up.length &&
              (up.charAt(k).isLetterOrDigit || up.charAt(k) == '_')) k += 1
            val w = up.substring(i, k)
            if (kws.contains(w)) cur = w
            else if (w == "JOIN") cur = "FROM"
            i = k
          } else i += 1
        }
        cur == "FROM"
      }
      val callRe = """(?i)(?<![\w.'"])([A-Za-z_]\w*)\s*\(""".r
      val hit = callRe.findAllMatchIn(masked).find { cm =>
        // scalar sites only: never directly after FROM/JOIN/LATERAL,
        // and never a comma-separated entry of a FROM list (`FROM t,
        // fn(x) AS a` — a function scan; inlining it as a scalar
        // subquery would silently change the output shape, so it stays
        // with the scan pass / errors loudly)
        val before = masked.substring(0, cm.start).reverse
          .dropWhile(_.isWhitespace)
        val prevWord = before.takeWhile(c =>
          c.isLetterOrDigit || c == '_').reverse.toLowerCase
        val notScan =
          prevWord != "from" && prevWord != "join" &&
          prevWord != "lateral" &&
          !(before.headOption.contains(',') && inFromClause(cm.start))
        notScan && {
          val i = closeParen(cm.end)
          val nA = splitTop(out.substring(cm.end, i - 1)).length
          resolve(cm.group(1).toLowerCase, nA).exists { fd =>
            // a NON-scalar (TABLE/record-returning) function with a
            // FROM-less SELECT body is a single composite row — PG
            // renders it as one composite value per call site
            // (row_types.sql's table_returner/record_returner in the
            // select list); the paren-wrapped inline becomes a row
            // constructor, which the dialect turns into a struct
            (fd.scalar || !hasTopLevelFrom(fd.body)) &&
              """(?is)^SELECT\s""".r.findPrefixMatchOf(fd.body).isDefined &&
              volatileRe.findFirstIn(fd.body).isEmpty
          } && """(?is)^\s*WITH\s+ORDINALITY""".r
            .findPrefixMatchOf(out.substring(i)).isEmpty
        }
      }
      hit.foreach { cm =>
        val i = closeParen(cm.end)
        val argText = out.substring(cm.end, i - 1)
        val fd = resolve(cm.group(1).toLowerCase,
          splitTop(argText).length).get
        substitute(fd, splitTop(argText)).foreach { b =>
          // a bare no-FROM SELECT inlines as its expression (PG
          // inline_function); a body WITH a FROM inlines as a scalar
          // subquery — same single-value contract at the call site
          val repl =
            if (hasTopLevelFrom(fd.body)) "(" + b.trim + ")"
            else {
              val expr =
                """(?is)^SELECT\s+""".r.replaceFirstIn(b, "").trim
              "(" + expr + ")"
            }
          out = out.substring(0, cm.start) + repl + out.substring(i)
          changed = true
        }
      }
    }
    out
  }

  private val keywords = Set("on", "where", "group", "order", "having",
    "limit", "offset", "join", "left", "right", "full", "inner",
    "cross", "natural", "union", "intersect", "except", "using",
    "with", "ordinality", "as", "lateral", "select", "for", "window")

  /** Mask single-quoted literal CONTENTS so scans never match inside
    * strings (positions preserved). */
  private def maskLiterals(s: String): String = {
    val a = s.toCharArray
    var inQ = false
    var i = 0
    while (i < a.length) {
      if (a(i) == '\'') inQ = !inQ
      else if (inQ) a(i) = ' '
      i += 1
    }
    new String(a)
  }

  /** Expand registered (and whitelisted-builtin) function scans in
    * `FROM fn(args) [AS] alias [(cols)]` / `JOIN fn(args) ...` and
    * `ROWS FROM (fn1(...), fn2(...)) AS a(c1, c2)` positions. Leaves
    * everything else byte-identical. */
  /** PG evaluates aggregates BEFORE applying a called function:
    * `SELECT fn(count(*)) FROM t` aggregates t to one row, then
    * applies fn to that value (reference nested_execution.sql:17,41
    * — Citus runs the aggregate on the coordinator and pushes only
    * the constant into the nested call). The macro inliner would
    * instead splice `count(*)` into the function BODY's WHERE, which
    * is both wrong and unanalyzable — so when the sole select item
    * is a registered scalar call whose single argument contains an
    * aggregate, hoist the argument into a pre-aggregation derived
    * table: `SELECT fn(x) FROM (SELECT <arg> AS x FROM <tail>) p`.
    * Conservative: single select item, single argument, no GROUP BY
    * in the tail (a grouped query returns multiple rows — different
    * contract, untouched). */
  private def hoistAggArgs(sql0: String): String = {
    val aggRe =
      """(?i)\b(count|sum|avg|min|max|bool_and|bool_or)\s*\(""".r
    if (aggRe.findFirstIn(maskLiterals(sql0)).isEmpty) return sql0
    val masked = maskLiterals(sql0)
    val head = ("""(?is)^\s*(INSERT\s+INTO\s+[A-Za-z_][\w.]*\s+)?""" +
      """SELECT\s+([A-Za-z_]\w*)\s*\(""").r
    val m = head.findPrefixMatchOf(masked).getOrElse(return sql0)
    var d = 1; var i = m.end
    while (d > 0 && i < masked.length) {
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ => ()
      }
      i += 1
    }
    if (d > 0) return sql0
    val close = i - 1
    val args = sql0.substring(m.end, close)
    val fromM = """(?is)^\s*FROM\s""".r
      .findPrefixMatchOf(masked.substring(close + 1))
      .getOrElse(return sql0)
    val tail = sql0.substring(close + 1 + fromM.end)
    if (splitTop(args).length != 1 ||
        aggRe.findFirstIn(maskLiterals(args)).isEmpty ||
        resolve(m.group(2).toLowerCase, 1).isEmpty ||
        """(?i)\bGROUP\s+BY\b""".r
          .findFirstIn(maskLiterals(tail)).isDefined) return sql0
    Option(m.group(1)).getOrElse("") +
      s"SELECT ${m.group(2)}(__nx_agg) FROM " +
      s"(SELECT ($args) AS __nx_agg FROM $tail) __nx_pre"
  }

  def expand(sql: String): String = {
    // fast path: nothing registered → nothing can expand (the builtin
    // JOIN-wrap only matters for corpora that also register functions)
    if (fns.isEmpty || !sql.contains("(")) return sql
    var out = hoistAggArgs(sql)
    var guard = 0
    var changed = true
    while (changed && guard < 20) {
      changed = false
      guard += 1
      val masked = maskLiterals(out)
      // ROWS FROM (f1(...), f2(...)) AS alias(c1, c2) — zip SRFs by
      // row position (PG pads the shorter with NULLs; FULL JOIN on
      // row_number matches that)
      val rowsRe = """(?i)\bROWS\s+FROM\s*\(""".r
      val rf = rowsRe.findFirstMatchIn(masked)
      if (rf.isDefined) {
        val mm = rf.get
        var d = 1; var i = mm.end
        while (d > 0 && i < out.length) {
          masked.charAt(i) match {
            case '(' => d += 1
            case ')' => d -= 1
            case _ => ()
          }
          i += 1
        }
        val inner = out.substring(mm.end, i - 1)
        val aliasRe =
          """(?is)^\s*(?:AS\s+)?([A-Za-z_]\w*)\s*\(([^)]*)\)""".r
        aliasRe.findPrefixMatchOf(out.substring(i)) match {
          case Some(am) =>
            val alias = am.group(1)
            val cols = am.group(2).split(",")
              .map(_.trim.split("\\s+")(0)).toSeq
            val calls = splitTop(inner)
            val callRe = """(?is)^([A-Za-z_]\w*)\s*\((.*)\)$""".r
            val parts = calls.zip(cols).zipWithIndex.flatMap {
              case ((c, colName), idx) => c.trim match {
                case callRe(fn, argText) =>
                  resolve(fn.toLowerCase,
                    splitTop(argText).length).flatMap { fd =>
                    substitute(fd, splitTop(argText)).map { body =>
                      // Ordinal = GENERATION order, not value order: PG
                      // zips ROWS FROM positionally, so a descending
                      // generate_series or a body with its own ORDER BY
                      // must keep its output ordering. A per-row
                      // monotonically_increasing_id (partition-major,
                      // row-minor) is sorted exactly in generation
                      // order; row_number over it is the PG ordinal.
                      s"(SELECT __c AS $colName, row_number() OVER " +
                        s"(ORDER BY __mid) AS __rn FROM " +
                        s"(SELECT __c, monotonically_increasing_id() " +
                        s"AS __mid FROM ($body) AS __t$idx(__c)) " +
                        s"AS __m$idx) __z$idx"
                    }
                  }
                case _ => None
              }
            }
            if (parts.length == calls.length && parts.nonEmpty) {
              val joined = parts.head + parts.tail.map(p =>
                s" FULL OUTER JOIN $p USING (__rn)").mkString
              val repl =
                s"(SELECT ${cols.mkString(", ")} FROM $joined) AS $alias"
              out = out.substring(0, mm.start) + repl +
                out.substring(i + am.end)
              changed = true
            }
          case None => ()
        }
      }
      if (!changed) {
        val masked2 = maskLiterals(out)
        def closeParen(start: Int): Int = {
          var d = 1; var i = start
          while (d > 0 && i < out.length) {
            masked2.charAt(i) match {
              case '(' => d += 1
              case ')' => d -= 1
              case _ => ()
            }
            i += 1
          }
          i
        }
        val scanRe = """(?i)(\bFROM|\bJOIN|,)\s*([A-Za-z_]\w*)\s*\(""".r
        // clause context at each position: the most recent same-depth
        // clause keyword — a comma-separated call is a function SCAN
        // only inside a FROM list (`FROM f_2(), f()`,
        // intermediate_results.sql:331), never in a select list or
        // GROUP BY
        lazy val clauseAt: Array[String] = {
          val kws = Seq("SELECT", "FROM", "WHERE", "GROUP", "HAVING",
            "ORDER", "LIMIT", "SET", "VALUES", "RETURNING", "WINDOW",
            "USING", "ON")
          val up = masked2.toUpperCase
          val res = new Array[String](up.length)
          val stack = scala.collection.mutable.Stack[String]()
          var cur = ""
          var i = 0
          def isW(c: Char) = c.isLetterOrDigit || c == '_'
          while (i < up.length) {
            up.charAt(i) match {
              case '(' => stack.push(cur); cur = ""
              case ')' => cur = if (stack.nonEmpty) stack.pop() else ""
              case _ =>
                kws.find(k => up.startsWith(k, i) &&
                  (i == 0 || !isW(up(i - 1))) &&
                  (i + k.length >= up.length || !isW(up(i + k.length))))
                  .foreach(k => cur = k)
            }
            res(i) = cur
            i += 1
          }
          res
        }
        // Skip (never abort on) WITH ORDINALITY call sites: ordinality
        // is handled elsewhere, but OTHER function scans in the same
        // statement must still expand — a non-local return here would
        // leave them untouched.
        val hit = scanRe.findAllMatchIn(masked2).find { sm =>
          val nm = sm.group(2).toLowerCase
          val eligible =
            (if (sm.group(1) == ",")
              fns.contains(nm) && clauseAt(sm.start) == "FROM"
            else fns.contains(nm) ||
              (sm.group(1).equalsIgnoreCase("JOIN") &&
                builtinScalar.contains(nm))) && !keywords.contains(nm)
          eligible && """(?is)^\s*WITH\s+ORDINALITY""".r
            .findPrefixMatchOf(out.substring(closeParen(sm.end))).isEmpty
        }
        hit.foreach { sm =>
          val nm = sm.group(2).toLowerCase
          val i = closeParen(sm.end)
          val argText = out.substring(sm.end, i - 1)
          val after = out.substring(i)
          val aliasRe =
            """(?is)^\s*(?:AS\s+)?([A-Za-z_]\w*)(\s*\(([^)]*)\))?""".r
          val (alias, siteCols, consumed) =
            aliasRe.findPrefixMatchOf(after) match {
              case Some(am) if !keywords.contains(
                  am.group(1).toLowerCase) =>
                val sc = Option(am.group(3)).map(_.split(",")
                  .map(_.trim.split("\\s+")(0).toLowerCase).toSeq)
                  .getOrElse(Nil)
                (am.group(1), sc, am.end)
              case _ => (nm, Seq.empty[String], 0)
            }
          val fdOpt = resolve(nm, splitTop(argText).length)
          val replOpt =
            if (fns.contains(nm))
              fdOpt.flatMap(fd =>
                expandCall(fd, splitTop(argText), alias, siteCols))
            else Some(s"(SELECT $nm($argText)) AS $alias($alias)")
          replOpt.foreach { repl =>
            out = out.substring(0, sm.start) + sm.group(1) + " " + repl +
              after.substring(consumed)
            changed = true
          }
        }
      }
    }
    inlineScalarCalls(out)
  }
}
