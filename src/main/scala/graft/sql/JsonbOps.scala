package graft.sql

/** PG `jsonb` subscripting semantics over text-carried JSON
  * (pg14.sql's test_jsonb_subscript battery; PG14 added subscript
  * reads `j['k']` and writes `SET j['k'] = v`, reference file
  * src/test/regress/sql/pg14.sql:418-470).
  *
  * jsonb is NOT textual JSON: PG parses to a binary form and renders
  * canonically — object keys dedup'd and sorted by (length, byte
  * order), `", "` between members, `": "` after keys, numbers kept
  * exact. Reads and writes here therefore parse → transform → render
  * through a minimal recursive-descent JSON model rather than string
  * surgery.
  *
  * Scale note: these back the `__jsonb_get`/`__jsonb_set` session
  * functions used only by the jsonb-subscript DIALECT surface (and
  * the replayer's UPDATE machinery) — corpus-replay paths over
  * row-level DML, not analytic hot paths. Analytic JSON extraction
  * stays on codegen'd `get_json_object`/`json_tuple` everywhere else
  * (JsonQueries, the JSON_TABLE compiler).
  */
object JsonbOps {

  sealed trait JVal
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JStr(s: String) extends JVal
  /** Numeric text preserved verbatim — PG renders the numeric it
    * stored, and every corpus literal is already in canonical form. */
  final case class JNum(text: String) extends JVal
  final case class JBool(b: Boolean) extends JVal
  case object JNull extends JVal

  // ----------------------------------------------------------------
  // parse
  // ----------------------------------------------------------------

  def parse(s: String): Option[JVal] =
    if (s == null) None
    else {
      val p = new P(s)
      try {
        p.ws()
        val v = p.value()
        p.ws()
        if (p.i == s.length) Some(v) else None
      } catch { case _: Exception => None }
    }

  private final class P(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def value(): JVal = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => num()
      }
    }
    private def lit(w: String): Unit = {
      require(s.regionMatches(i, w, 0, w.length)); i += w.length
    }
    private def obj(): JObj = {
      i += 1; ws()
      val fs = Vector.newBuilder[(String, JVal)]
      if (s.charAt(i) == '}') { i += 1; return JObj(Vector.empty) }
      var go = true
      while (go) {
        ws()
        val k = str()
        ws(); require(s.charAt(i) == ':'); i += 1
        val v = value()
        fs += ((k, v))
        ws()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; go = false
          case _ => throw new IllegalArgumentException("obj")
        }
      }
      JObj(fs.result())
    }
    private def arr(): JArr = {
      i += 1; ws()
      val is = Vector.newBuilder[JVal]
      if (s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
      var go = true
      while (go) {
        is += value()
        ws()
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; go = false
          case _ => throw new IllegalArgumentException("arr")
        }
      }
      JArr(is.result())
    }
    private def str(): String = {
      require(s.charAt(i) == '"'); i += 1
      val b = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => b += '\n'
            case 't' => b += '\t'
            case 'r' => b += '\r'
            case 'b' => b += '\b'
            case 'f' => b += '\f'
            case 'u' =>
              b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => b += c
          }
        } else b += s.charAt(i)
        i += 1
      }
      i += 1
      b.toString
    }
    private def num(): JNum = {
      val st = i
      while (i < s.length && ("+-.eE".indexOf(s.charAt(i)) >= 0 ||
        s.charAt(i).isDigit)) i += 1
      require(i > st)
      JNum(s.substring(st, i))
    }
  }

  // ----------------------------------------------------------------
  // render — PG jsonb canonical text
  // ----------------------------------------------------------------

  /** jsonb object key order: length first, then byte order
    * (PG's lengthCompareJsonbStringValue sort). */
  private val keyOrd: Ordering[String] = (a: String, b: String) => {
    if (a.length != b.length) a.length - b.length
    else {
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      var i = 0; var r = 0
      while (r == 0 && i < math.min(ab.length, bb.length)) {
        r = (ab(i) & 0xff) - (bb(i) & 0xff); i += 1
      }
      if (r != 0) r else ab.length - bb.length
    }
  }

  private def renderStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b ++= "\\\""
      case '\\' => b ++= "\\\\"
      case '\n' => b ++= "\\n"
      case '\t' => b ++= "\\t"
      case '\r' => b ++= "\\r"
      case c if c < ' ' => b ++= f"\\u${c.toInt}%04x"
      case c => b += c
    }
    (b += '"').toString
  }

  def render(v: JVal): String = v match {
    case JObj(fs) =>
      // later writes win on duplicate keys, then canonical sort
      val dedup = fs.foldLeft(Vector.empty[(String, JVal)]) {
        case (acc, (k, x)) => acc.filterNot(_._1 == k) :+ ((k, x))
      }
      dedup.sortBy(_._1)(keyOrd)
        .map { case (k, x) => s"${renderStr(k)}: ${render(x)}" }
        .mkString("{", ", ", "}")
    case JArr(is) => is.map(render).mkString("[", ", ", "]")
    case JStr(s) => renderStr(s)
    case JNum(t) => t
    case JBool(b) => b.toString
    case JNull => "null"
  }

  // ----------------------------------------------------------------
  // subscript read / write
  // ----------------------------------------------------------------

  /** IS JSON WITH UNIQUE KEYS (PG16, pg16.sql's test_is_json
    * battery): every OBJECT at every nesting level must have distinct
    * keys. Unparseable input → false (the caller ANDs with validity). */
  def hasUniqueKeys(json: String): Boolean = {
    def chk(v: JVal): Boolean = v match {
      case JObj(fs) =>
        fs.map(_._1).distinct.length == fs.length &&
          fs.forall(f => chk(f._2))
      case JArr(is) => is.forall(chk)
      case _ => true
    }
    parse(json).exists(chk)
  }

  /** `j['k']` / `j[i]` read → the member's canonical jsonb TEXT
    * (PG renders subscript reads as jsonb), or NULL when absent. */
  /** jsonpath recursive descent `$.**."key"` (pg18.sql's WAL-EXPLAIN
    * battery probes plan documents this way): preorder walk in
    * document order over objects AND arrays, returning the rendered
    * value of the FIRST member named `key` — jsonb_path_query_first
    * semantics. A key holding JSON null returns the text "null"
    * (non-SQL-NULL), so `IS NOT NULL` over this matches PG's
    * jsonb_path_exists (present-with-null → true). */
  def descendFirst(json: String, key: String): String = {
    def walk(v: JVal): Option[JVal] = v match {
      case JObj(fs) =>
        fs.collectFirst { case (k, vv) if k == key => vv }
          .orElse(fs.iterator.map(f => walk(f._2))
            .collectFirst { case Some(hit) => hit })
      case JArr(is) =>
        is.iterator.map(walk).collectFirst { case Some(hit) => hit }
      case _ => None
    }
    (for { j <- Option(json); p <- parse(j); hit <- walk(p) }
      yield render(hit)).orNull
  }

  def get(json: String, key: String): String =
    (parse(json), Option(key)) match {
      case (Some(JObj(fs)), Some(k)) =>
        fs.reverse.collectFirst { case (kk, v) if kk == k => render(v) }
          .orNull
      case (Some(JArr(is)), Some(k)) if k.matches("-?\\d+") =>
        val idx0 = k.toInt
        val idx = if (idx0 < 0) is.length + idx0 else idx0
        if (idx >= 0 && idx < is.length) render(is(idx)) else null
      case _ => null
    }

  /** `SET j[key] = value` write. PG14 jsonb-subscript assignment:
    *  - NULL source + integer key → a new ARRAY holding the value
    *    (pg14.sql: `test_json[0] = '1'` over NULL → `[1]`);
    *  - NULL source + text key → a new object `{key: value}`;
    *  - object source → set/replace the key (ANY key, integers become
    *    text keys: `{"0": 1, ...}`);
    *  - array source + integer key → replace in range; beyond the end
    *    extends with JSON nulls then appends; negative counts back.
    *  - SQL NULL value → JSON null (`'another_key': null` golden).
    * Renders canonically, so the stored text is what PG would show. */
  def set(json: String, key: String, value: String): String = {
    if (key == null) return json // PG errors; the .out pre-excludes
    val v = Option(value).flatMap(parse).getOrElse(JNull)
    val intKey = key.matches("-?\\d+")
    val src = Option(json).filter(_.trim.nonEmpty).flatMap(parse)
    val out: JVal = src match {
      case None =>
        if (intKey) JArr(Vector(v)) else JObj(Vector((key, v)))
      case Some(JObj(fs)) => JObj(fs :+ ((key, v)))
      case Some(JArr(is)) if intKey =>
        val idx0 = key.toInt
        val idx = if (idx0 < 0) is.length + idx0 else idx0
        if (idx >= 0 && idx < is.length) JArr(is.updated(idx, v))
        else if (idx >= is.length)
          JArr(is ++ Vector.fill(idx - is.length)(JNull) :+ v)
        else JArr(v +: is)
      case Some(other) => other // scalar source: PG errors; keep as-is
    }
    render(out)
  }
}
