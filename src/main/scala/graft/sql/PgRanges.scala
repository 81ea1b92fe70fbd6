package graft.sql

import scala.math.BigDecimal

/** PG range types (int4range / int8range / numrange / daterange) and
  * multiranges, re-expressed for Spark.
  *
  * The reference corpus uses ranges two ways (sqlancer_failures.sql's
  * int4range operator algebra over constant literals; pg14/pg15's
  * numrange/nummultirange/daterange constructors feeding columnar
  * tables and range_agg — reference files
  * src/test/regress/sql/sqlancer_failures.sql:236-247, pg14.sql:588,
  * pg15.sql:631):
  *
  *  1. CONSTANT algebra — every operand is a literal. These fold at
  *     translate time in exact BigDecimal arithmetic: `'[1,5)'::
  *     int4range * '[3,9)'::int4range` becomes the canonical text
  *     literal `'[3,5)'`, and boolean operators (`&&`, `@>`, `&<`, ...)
  *     become TRUE/FALSE. Nothing reaches the executor, which is
  *     exactly what PG's own constant-folding does to these.
  *  2. RUNTIME column forms — `int4range(a, b) @> x` and
  *     `int4range(a,b) && int4range(c,d)` over columns compile to
  *     plain comparison expressions (whole-stage codegen, no UDF);
  *     range VALUES stored in tables ride as PG's canonical text
  *     (discrete ranges canonicalize to `[lo,hi)`), so grouping,
  *     equality and joins on range columns are plain string ops.
  *
  * range_agg (pg15.sql:657) is collect_list + a per-GROUP finisher
  * that sorts, merges overlapping/adjacent ranges and renders the
  * multirange text — the same partial/final split the two-phase
  * aggregate rules give every other aggregate here.
  */
object PgRanges {

  /** One range in bound-normal form. `None` = infinite bound.
    * Discrete kinds (int/date) canonicalize to loInc=true, hiInc=false
    * at parse/construct time, like PG's int4range canonical function. */
  final case class PgRange(
      lo: Option[BigDecimal], hi: Option[BigDecimal],
      loInc: Boolean, hiInc: Boolean) {
    def isEmpty: Boolean = (lo, hi) match {
      case (Some(a), Some(b)) =>
        a > b || (a == b && !(loInc && hiInc))
      case _ => false
    }
  }
  val Empty: PgRange = PgRange(Some(0), Some(0), loInc = true, hiInc = false)

  /** Lower-bound sort key: -inf < [v < (v. Higher key = later start. */
  private def loKey(r: PgRange): (Int, BigDecimal, Int) =
    r.lo.map(v => (0, v, if (r.loInc) 0 else 1)).getOrElse((-1, 0, 0))
  /** Upper-bound sort key: v) < v] < +inf. Higher key = later end. */
  private def hiKey(r: PgRange): (Int, BigDecimal, Int) =
    r.hi.map(v => (0, v, if (r.hiInc) 1 else 0)).getOrElse((1, 0, 0))
  private val keyOrd = implicitly[Ordering[(Int, BigDecimal, Int)]]

  def intersect(a: PgRange, b: PgRange): PgRange = {
    val lo = if (keyOrd.gteq(loKey(a), loKey(b))) (a.lo, a.loInc)
      else (b.lo, b.loInc)
    val hi = if (keyOrd.lteq(hiKey(a), hiKey(b))) (a.hi, a.hiInc)
      else (b.hi, b.hiInc)
    val r = PgRange(lo._1, hi._1, lo._2, hi._2)
    if (r.isEmpty) Empty else r
  }

  def overlaps(a: PgRange, b: PgRange): Boolean =
    !a.isEmpty && !b.isEmpty && !intersect(a, b).isEmpty

  /** `a` ends strictly before `b` starts (no common point). */
  private def endsBefore(a: PgRange, b: PgRange): Boolean =
    (a.hi, b.lo) match {
      case (Some(h), Some(l)) =>
        h < l || (h == l && !(a.hiInc && b.loInc))
      case _ => false
    }

  /** `a.hi` meets `b.lo` exactly (adjacent, no gap, no overlap). */
  private def meets(a: PgRange, b: PgRange): Boolean =
    (a.hi, b.lo) match {
      case (Some(h), Some(l)) => h == l && (a.hiInc ^ b.loInc)
      case _ => false
    }

  def adjacent(a: PgRange, b: PgRange): Boolean =
    !a.isEmpty && !b.isEmpty && (meets(a, b) || meets(b, a))

  /** Contiguous union; None = PG ERROR (disjoint, non-adjacent). */
  def union(a: PgRange, b: PgRange): Option[PgRange] =
    if (a.isEmpty) Some(b)
    else if (b.isEmpty) Some(a)
    else if (!overlaps(a, b) && !adjacent(a, b)) None
    else {
      val lo = if (keyOrd.lteq(loKey(a), loKey(b))) (a.lo, a.loInc)
        else (b.lo, b.loInc)
      val hi = if (keyOrd.gteq(hiKey(a), hiKey(b))) (a.hi, a.hiInc)
        else (b.hi, b.hiInc)
      Some(PgRange(lo._1, hi._1, lo._2, hi._2))
    }

  /** Difference; None = PG ERROR (b strictly inside a → two pieces). */
  def minus(a: PgRange, b: PgRange): Option[PgRange] = {
    val i = intersect(a, b)
    if (i.isEmpty) Some(a)
    else if (keyOrd.lteq(loKey(b), loKey(a)) &&
      keyOrd.gteq(hiKey(b), hiKey(a))) Some(Empty)
    else if (keyOrd.lteq(loKey(b), loKey(a)))
      // b covers a's left: keep (i.hi, a.hi], flipping i's hi bound
      Some(PgRange(i.hi, a.hi, !i.hiInc, a.hiInc))
    else if (keyOrd.gteq(hiKey(b), hiKey(a)))
      Some(PgRange(a.lo, i.lo, a.loInc, !i.loInc))
    else None
  }

  def containsRange(a: PgRange, b: PgRange): Boolean =
    b.isEmpty || (!a.isEmpty && intersect(a, b) == b)

  def containsElem(a: PgRange, x: BigDecimal): Boolean =
    !a.isEmpty &&
      a.lo.forall(l => if (a.loInc) x >= l else x > l) &&
      a.hi.forall(h => if (a.hiInc) x <= h else x < h)

  /** `a &< b`: a does not extend to the right of b. False when either
    * range is empty (PG range_before/after family convention). */
  def notExtRight(a: PgRange, b: PgRange): Boolean =
    !a.isEmpty && !b.isEmpty && keyOrd.lteq(hiKey(a), hiKey(b))
  def notExtLeft(a: PgRange, b: PgRange): Boolean =
    !a.isEmpty && !b.isEmpty && keyOrd.gteq(loKey(a), loKey(b))
  def strictlyLeft(a: PgRange, b: PgRange): Boolean =
    !a.isEmpty && !b.isEmpty && endsBefore(a, b)
  def strictlyRight(a: PgRange, b: PgRange): Boolean =
    !a.isEmpty && !b.isEmpty && endsBefore(b, a)

  // ---------------------------------------------------------------
  // parse / render
  // ---------------------------------------------------------------

  /** Value kinds: "int" (int4/int8: BigDecimal integers),
    * "num" (numeric, exact), "date" (stored as epoch day). */
  private def parseVal(kind: String, s0: String): Option[BigDecimal] = {
    val s = s0.trim.stripPrefix("\"").stripSuffix("\"")
    if (s.isEmpty) None
    else Some(kind match {
      case "date" => BigDecimal(
        java.time.LocalDate.parse(s.stripPrefix("'").stripSuffix("'"))
          .toEpochDay)
      case _ => BigDecimal(s)
    })
  }

  private def renderVal(kind: String, v: BigDecimal): String = kind match {
    case "date" => java.time.LocalDate.ofEpochDay(v.toLong).toString
    case _ => v.underlying.toPlainString
  }

  private def discrete(kind: String): Boolean =
    kind == "int" || kind == "date"

  /** Discrete canonicalization to `[lo,hi)` (PG's int4range_canonical). */
  def canonical(kind: String, r: PgRange): PgRange =
    if (!discrete(kind) || r.isEmpty) { if (r.isEmpty) Empty else r }
    else {
      val lo = r.lo.map(v => if (r.loInc) v else v + 1)
      val hi = r.hi.map(v => if (r.hiInc) v + 1 else v)
      val c = PgRange(lo, hi, loInc = true, hiInc = false)
      if (c.isEmpty) Empty else c
    }

  /** `'[a,b)'` / `'(a,b]'` / `'[,5)'` / `'empty'` range input text. */
  def parseRangeText(kind: String, txt0: String): Option[PgRange] = {
    val txt = txt0.trim
    if (txt.equalsIgnoreCase("empty")) return Some(Empty)
    if (txt.length < 3) return None
    val loC = txt.head; val hiC = txt.last
    if ((loC != '[' && loC != '(') || (hiC != ']' && hiC != ')'))
      return None
    val body = txt.substring(1, txt.length - 1)
    val comma = body.indexOf(',')
    if (comma < 0) return None
    try {
      val lo = parseVal(kind, body.substring(0, comma))
      val hi = parseVal(kind, body.substring(comma + 1))
      Some(canonical(kind,
        PgRange(lo, hi, loC == '[', hiC == ']')))
    } catch { case _: Exception => None }
  }

  /** PG's canonical range output text (range_out). */
  def render(kind: String, r: PgRange): String =
    if (r.isEmpty) "empty"
    else {
      val lb = if (r.lo.isDefined && r.loInc) "[" else "("
      val hb = if (r.hi.isDefined && r.hiInc) "]" else ")"
      lb + r.lo.map(renderVal(kind, _)).getOrElse("") + "," +
        r.hi.map(renderVal(kind, _)).getOrElse("") + hb
    }

  /** Multirange normalization: drop empties, sort by lower bound,
    * merge overlapping/adjacent (PG multirange_canonicalize). */
  def normalizeMulti(rs: Seq[PgRange]): Seq[PgRange] = {
    val live = rs.filterNot(_.isEmpty).sortBy(loKey)(keyOrd)
    val out = scala.collection.mutable.Buffer[PgRange]()
    live.foreach { r =>
      if (out.nonEmpty &&
        (overlaps(out.last, r) || adjacent(out.last, r)))
        out(out.length - 1) = union(out.last, r).get
      else out += r
    }
    out.toSeq
  }

  def renderMulti(kind: String, rs: Seq[PgRange]): String =
    normalizeMulti(rs).map(render(kind, _)).mkString("{", ",", "}")

  /** `'{[a,b),...}'` multirange input text → ranges, or None when the
    * text is not multirange-shaped (so `'{1,2,3}'` array text and JSON
    * never match). */
  def parseMultiText(kind: String, txt0: String): Option[Seq[PgRange]] = {
    val txt = txt0.trim
    if (!txt.startsWith("{") || !txt.endsWith("}")) return None
    val body = txt.substring(1, txt.length - 1).trim
    if (body.isEmpty) return Some(Seq.empty)
    // split on commas OUTSIDE brackets
    val items = scala.collection.mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 0
    body.foreach {
      case c @ ('[' | '(') => depth += 1; cur += c
      case c @ (']' | ')') => depth -= 1; cur += c
      case ',' if depth == 0 => items += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) items += cur.toString
    val parsed = items.map(i => parseRangeText(kind, i.trim))
    if (parsed.forall(_.isDefined)) Some(parsed.map(_.get).toSeq)
    else None
  }

  /** range_agg finisher: merge a group's range texts into PG's
    * multirange text. NULL-safe: null/blank inputs drop; an all-null
    * group renders NULL upstream (collect_list drops nulls → empty
    * list → null here, matching PG's strict transition). */
  def rangeAggFinish(texts: Seq[String]): String =
    if (texts == null || texts.isEmpty) null
    else {
      val live = texts.filter(t => t != null && t.nonEmpty)
        .map(_.stripPrefix("'").stripSuffix("'"))
      if (live.isEmpty) null
      else {
        // self-describing value kind: ISO dates vs numerics
        val kind =
          if (live.exists("""\d{4}-\d{2}-\d{2}""".r
            .findFirstIn(_).isDefined)) "date"
          else "num"
        renderMulti(kind, live.flatMap(parseRangeText(kind, _)))
      }
    }

  // ---------------------------------------------------------------
  // dialect rewrite: constant folding + runtime forms
  // ---------------------------------------------------------------

  private val typeKind = Map(
    "int4range" -> "int", "int8range" -> "int",
    "numrange" -> "num", "daterange" -> "date",
    "nummultirange" -> "num", "int4multirange" -> "int",
    "int8multirange" -> "int", "datemultirange" -> "date")

  /** One folded constant: a range or multirange value. */
  private final case class Tok(kind: String, rs: Seq[PgRange],
      multi: Boolean) {
    def single: PgRange = rs.head
  }

  private def markerOf(i: Int) = s"__PGRANGE_${i}__"
  private val markerRe = """__PGRANGE_(\d+)__""".r

  def rewrite(sql0: String): String = {
    // fast path: nothing range-like. Besides the obvious "range"
    // token, a quoted brace literal opening with a bound bracket or
    // `empty` is multirange TEXT that must normalize even without a
    // range keyword in the statement — the replayer evaluates INSERT
    // cells through bare `SELECT (VALUES ...)` splices where the
    // range-typed table name is absent (pg14.sql `'{[, 5)}'`,
    // `'{empty}'`). JSON objects open `{"`, numeric arrays `{1`,
    // so neither can match.
    if ("""(?i)range""".r.findFirstIn(sql0).isEmpty &&
      """'\{\s*(?:empty|[\[(])""".r.findFirstIn(sql0).isEmpty)
      return sql0
    val toks = scala.collection.mutable.ArrayBuffer[Tok]()
    def mk(t: Tok): String = { toks += t; markerOf(toks.length - 1) }
    var s = sql0

    // 1. typed literals: '<text>'::int4range etc.
    s = """'([^']*)'\s*::\s*(int4range|int8range|numrange|daterange|nummultirange|int4multirange|int8multirange|datemultirange)\b""".r
      .replaceAllIn(s, m => {
        val tn = m.group(2).toLowerCase
        val kind = typeKind(tn)
        val folded =
          if (tn.endsWith("multirange"))
            parseMultiText(kind, m.group(1))
              .map(rs => mk(Tok(kind, normalizeMulti(rs), multi = true)))
          else parseRangeText(kind, m.group(1))
            .map(r => mk(Tok(kind, Seq(r), multi = false)))
        java.util.regex.Matcher.quoteReplacement(
          folded.getOrElse(m.matched))
      })
    // `variadic '{}'::numrange[]` (pg14.sql:594): empty array of
    // ranges feeding a multirange constructor → empty multirange
    s = """(?i)\bvariadic\s+'\{\}'\s*::\s*(num|int4|int8|date)range\s*\[\s*\]""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        mk(Tok(typeKind(m.group(1).toLowerCase + "range"), Seq.empty,
          multi = true))))

    // 2. constant constructors: numrange(1.1, 2.2[, '[]']),
    //    int4range(1, 5), daterange('2018-07-01','2018-07-07').
    //    Only ALL-literal argument lists fold; column args fall
    //    through to the runtime forms below.
    val litArg = """\s*(?:NULL|'[^']*'|-?\d+(?:\.\d+)?)\s*"""
    val ctorRe = ("""(?i)\b(int4range|int8range|numrange|daterange)\s*\(""" +
      s"""($litArg,$litArg(?:,\\s*'[^']*'\\s*)?)\\)""").r
    s = ctorRe.replaceAllIn(s, m => {
      val kind = typeKind(m.group(1).toLowerCase)
      val args = m.group(2).split(",").map(_.trim)
      try {
        val bounds = if (args.length > 2)
          args(2).stripPrefix("'").stripSuffix("'") else "[)"
        def num(a: String): Option[BigDecimal] =
          if (a.equalsIgnoreCase("NULL")) None
          else parseVal(kind, a.stripPrefix("'").stripSuffix("'"))
        val r = canonical(kind, PgRange(num(args(0)), num(args(1)),
          bounds.charAt(0) == '[', bounds.charAt(1) == ']'))
        java.util.regex.Matcher.quoteReplacement(
          mk(Tok(kind, Seq(r), multi = false)))
      } catch { case _: Exception =>
        java.util.regex.Matcher.quoteReplacement(m.matched) }
    })

    // 3. multirange constructors over folded range markers:
    //    nummultirange(), nummultirange(<marker>, <marker>, ...)
    s = """(?i)\b(nummultirange|int4multirange|int8multirange|datemultirange)\s*\(\s*((?:__PGRANGE_\d+__\s*,?\s*)*)\)""".r
      .replaceAllIn(s, m => {
        val kind = typeKind(m.group(1).toLowerCase)
        // flatMap: a MULTI token argument (the `variadic '{}'::
        // numrange[]` fold, pg14.sql:594) contributes its ranges —
        // `.single` on an empty multirange token would throw
        val rs = markerRe.findAllMatchIn(m.group(2))
          .flatMap(mm => toks(mm.group(1).toInt).rs).toSeq
        java.util.regex.Matcher.quoteReplacement(
          mk(Tok(kind, normalizeMulti(rs), multi = true)))
      })

    // 4. fold parens and binary operators to fixpoint
    var go = true
    var guard = 0
    while (go && guard < 500) {
      go = false; guard += 1
      // expression parens only: a word char before `(` means a
      // FUNCTION/VALUES head — `VALUES(<marker>)` and
      // `lower(<marker>)` must keep their parens (pg14.sql's
      // multirange INSERTs)
      val parened = """(?<![\w])\(\s*(__PGRANGE_\d+__)\s*\)""".r
        .replaceAllIn(s, m =>
          java.util.regex.Matcher.quoteReplacement(m.group(1)))
      if (parened != s) { s = parened; go = true }
      val binRe =
        """__PGRANGE_(\d+)__\s*(-\|-|\*|\+|&&|@>|<@|<<|>>|&<|&>|<>|!=|=|-)\s*__PGRANGE_(\d+)__""".r
      val folded = binRe.replaceAllIn(s, m => {
        val a = toks(m.group(1).toInt); val b = toks(m.group(3).toInt)
        val op = m.group(2)
        val out: Option[String] =
          if (a.multi || b.multi) op match {
            // multirange ops in the corpus are equality only
            case "=" => Some(
              if (normalizeMulti(a.rs) == normalizeMulti(b.rs)) "TRUE"
              else "FALSE")
            case "<>" | "!=" => Some(
              if (normalizeMulti(a.rs) == normalizeMulti(b.rs)) "FALSE"
              else "TRUE")
            case _ => None
          } else {
            val (x, y) = (a.single, b.single)
            def bool(v: Boolean) = Some(if (v) "TRUE" else "FALSE")
            op match {
              case "*" => Some(mk(Tok(a.kind,
                Seq(canonical(a.kind, intersect(x, y))), multi = false)))
              case "+" => union(x, y).map(u =>
                mk(Tok(a.kind, Seq(canonical(a.kind, u)), multi = false)))
              case "-" => minus(x, y).map(d =>
                mk(Tok(a.kind, Seq(canonical(a.kind, d)), multi = false)))
              case "&&" => bool(overlaps(x, y))
              case "@>" => bool(containsRange(x, y))
              case "<@" => bool(containsRange(y, x))
              case "<<" => bool(strictlyLeft(x, y))
              case ">>" => bool(strictlyRight(x, y))
              case "&<" => bool(notExtRight(x, y))
              case "&>" => bool(notExtLeft(x, y))
              case "-|-" => bool(adjacent(x, y))
              case "=" => bool(x == y)
              case "<>" | "!=" => bool(x != y)
              case _ => None
            }
          }
        java.util.regex.Matcher.quoteReplacement(out.getOrElse(m.matched))
      })
      if (folded != s) { s = folded; go = true }
      // elem containment with a constant range: marker @> <num>,
      // <num> <@ marker
      val elemRe =
        """__PGRANGE_(\d+)__\s*@>\s*(-?\d+(?:\.\d+)?)(?![\w.])""".r
      val folded2 = elemRe.replaceAllIn(s, m => {
        val t = toks(m.group(1).toInt)
        if (t.multi) m.matched
        else java.util.regex.Matcher.quoteReplacement(
          if (containsElem(t.single, BigDecimal(m.group(2)))) "TRUE"
          else "FALSE")
      })
      if (folded2 != s) { s = folded2; go = true }
      // elem containment where the element is a COLUMN: the constant
      // range's bounds compile to plain comparisons (codegen-able; the
      // filter can reach the scan)
      def boundsPred(t: Tok, x: String): String =
        if (t.multi || t.single.isEmpty) "FALSE"
        else {
          val r = t.single
          def v(b: BigDecimal) =
            if (t.kind == "date")
              s"DATE '${java.time.LocalDate.ofEpochDay(b.toLong)}'"
            else b.underlying.toPlainString
          val cs = Seq(
            r.lo.map(l => s"$x ${if (r.loInc) ">=" else ">"} ${v(l)}"),
            r.hi.map(h => s"$x ${if (r.hiInc) "<=" else "<"} ${v(h)}")
          ).flatten
          if (cs.isEmpty) s"$x IS NOT NULL"
          else cs.mkString("(", " AND ", ")")
        }
      val elemColRe =
        """__PGRANGE_(\d+)__\s*@>\s*([A-Za-z_][\w.]*)(?!\s*\()""".r
      val folded2b = elemColRe.replaceAllIn(s, m => {
        val t = toks(m.group(1).toInt)
        if (t.multi) m.matched
        else java.util.regex.Matcher.quoteReplacement(
          boundsPred(t, m.group(2)))
      })
      if (folded2b != s) { s = folded2b; go = true }
      val colElemRe =
        """([A-Za-z_][\w.]*)\s*<@\s*__PGRANGE_(\d+)__""".r
      val folded2c = colElemRe.replaceAllIn(s, m => {
        val t = toks(m.group(2).toInt)
        if (t.multi) m.matched
        else java.util.regex.Matcher.quoteReplacement(
          boundsPred(t, m.group(1)))
      })
      if (folded2c != s) { s = folded2c; go = true }
      // accessor functions over a folded range
      val fnRe = """(?i)\b(lower|upper|isempty|lower_inc|upper_inc|lower_inf|upper_inf)\s*\(\s*__PGRANGE_(\d+)__\s*\)""".r
      val folded3 = fnRe.replaceAllIn(s, m => {
        val t = toks(m.group(2).toInt)
        if (t.multi) m.matched else {
          val r = t.single
          def vtxt(b: Option[BigDecimal]) = b.map { v =>
            if (t.kind == "date") s"DATE '${renderVal(t.kind, v)}'"
            else renderVal(t.kind, v)
          }.getOrElse("NULL")
          val rep = m.group(1).toLowerCase match {
            case "lower" => if (r.isEmpty) "NULL" else vtxt(r.lo)
            case "upper" => if (r.isEmpty) "NULL" else vtxt(r.hi)
            case "isempty" => if (r.isEmpty) "TRUE" else "FALSE"
            case "lower_inc" =>
              if (!r.isEmpty && r.loInc && r.lo.isDefined) "TRUE"
              else "FALSE"
            case "upper_inc" =>
              if (!r.isEmpty && r.hiInc && r.hi.isDefined) "TRUE"
              else "FALSE"
            case "lower_inf" =>
              if (!r.isEmpty && r.lo.isEmpty) "TRUE" else "FALSE"
            case "upper_inf" =>
              if (!r.isEmpty && r.hi.isEmpty) "TRUE" else "FALSE"
          }
          java.util.regex.Matcher.quoteReplacement(rep)
        }
      })
      if (folded3 != s) { s = folded3; go = true }
    }

    // 5. leftover markers render as canonical PG text literals —
    //    a SELECTed constant range / an INSERT VALUES cell / an
    //    equality operand against a text-carried range column
    s = markerRe.replaceAllIn(s, m => {
      val t = toks(m.group(1).toInt)
      val txt = if (t.multi) renderMulti(t.kind, t.rs)
        else render(t.kind, t.single)
      java.util.regex.Matcher.quoteReplacement(s"'$txt'")
    })

    // 6. RUNTIME column forms (no constant folding possible):
    //    int4range(a,b) @> x  → bounds comparison;
    //    int4range(a,b) && int4range(c,d) → greatest/least overlap.
    //    Default '[)' bounds; NULL bound = infinite (IS NULL guards;
    //    Spark's greatest/least skip NULLs, which IS the infinite-
    //    bound semantics for overlap).
    val rtCtor = """(?i)\b(?:int4range|int8range)\s*\(\s*([^(),]+?)\s*,\s*([^(),]+?)\s*\)"""
    s = (rtCtor + """\s*&&\s*""" + rtCtor).r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"(greatest(${m.group(1)}, ${m.group(3)}) < " +
          s"least(${m.group(2)}, ${m.group(4)}))"))
    s = (rtCtor + """\s*@>\s*([A-Za-z_][\w.]*|-?\d+(?:\.\d+)?)""").r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"((${m.group(1)}) IS NULL OR ${m.group(3)} >= (${m.group(1)})) " +
          s"AND ((${m.group(2)}) IS NULL OR ${m.group(3)} < (${m.group(2)}))"))

    // 7. multirange-shaped TEXT literals normalize to canonical form
    //    so text-carried multirange columns compare like PG renders
    //    them (`'{[, 5)}'` → `'{[,5)}'`, pg14.sql:592). The grammar
    //    (brace list of bracket-bounded pairs / `empty`) cannot match
    //    array or JSON literals.
    s = """'(\{[^{}']*\})'""".r.replaceAllIn(s, m => {
      parseMultiText("num", m.group(1)) match {
        case Some(rs) if m.group(1) != "{}" =>
          java.util.regex.Matcher.quoteReplacement(
            s"'${renderMulti("num", rs)}'")
        case _ => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
    })

    // 8. range_agg(x [ORDER BY ...]) → per-group merge finisher over
    //    collect_list (ordering is immaterial: the finisher sorts)
    s = """(?i)\brange_agg\s*\(\s*([A-Za-z_][\w.]*)(?:\s+ORDER\s+BY\s+[^()]*?)?\s*\)""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"__range_agg(collect_list(${m.group(1)}))"))
    s
  }
}
