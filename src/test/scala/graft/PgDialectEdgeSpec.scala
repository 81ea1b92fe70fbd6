package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.PgDialect

/** Regression pins for dialect shapes the reference corpus never
  * exercises — each one is a previously-reported-and-fixed defect
  * (rounds 9/10 advisory findings) whose fix shipped without a test,
  * so a future dialect refactor could silently reintroduce it. The
  * goldens are PG's own semantics (reference:
  * src/test/regress/sql/sqlancer_failures.sql,
  * pg13_with_ties.sql:1-15, pg17_json.sql JSON_TABLE battery).
  */
class PgDialectEdgeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      Seq((1, 10), (1, 20), (2, 10)).map(t => org.apache.spark.sql.Row(t._1, t._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.IntegerType))))
      .createOrReplaceTempView("edge_gs")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] =
    PgDialect.sql(spark, q).collect().toSeq.map(_.toSeq)

  private def one(q: String): Any = rows(q).head.head

  test("multi-column GROUPING SETS ((a,b),(a),()) translates verbatim " +
      "(tuple sets must not collapse into named_struct keys)") {
    val got = rows("SELECT a, b, count(*) AS c FROM edge_gs " +
      "GROUP BY GROUPING SETS ((a, b), (a), ()) ORDER BY a, b, c")
    assert(got.size === 6, s"expected 6 grouping-set rows, got $got")
    assert(got.contains(Seq(1, 10, 1L)) && got.contains(Seq(1, 20, 1L)) &&
      got.contains(Seq(2, 10, 1L)), s"detail rows wrong: $got")
    assert(got.contains(Seq(1, null, 2L)) && got.contains(Seq(2, null, 1L)),
      s"per-a subtotal rows wrong: $got")
    assert(got.contains(Seq(null, null, 3L)), s"grand total wrong: $got")
  }

  test("JSON_TABLE in FROM with a trailing WHERE on generated columns " +
      "must NOT flatten away the FROM clause") {
    val got = rows("""SELECT * FROM JSON_TABLE('[{"k": 1}, {"k": -2}]',
      '$[*]' COLUMNS (k int PATH '$.k')) AS jt WHERE k > 0""")
    assert(got === Seq(Seq(1)), s"expected the single k=1 row, got $got")
  }

  test("SIMILAR TO: dot is a LITERAL, escaped wildcard is a literal " +
      "(PG metachars are only | * + ? { } ( ) [ ] % _)") {
    val got = rows(
      "SELECT 'abc' SIMILAR TO 'a.c', 'a.c' SIMILAR TO 'a.c', " +
        "'a%c' SIMILAR TO 'a\\%c', 'abc' SIMILAR TO 'a\\%c'").head
    assert(got === Seq(false, true, true, false),
      s"SIMILAR TO quartet must be [false,true,true,false], got $got")
  }

  test("count(alias.*) over an outer join counts only MATCHED rows " +
      "(PG whole-row var is NULL on the null-extended side)") {
    spark.sql("SELECT * FROM VALUES (1), (2), (3) AS t(lk)")
      .createOrReplaceTempView("edge_lt")
    spark.sql("SELECT * FROM VALUES (2, 'x') AS t(rk, rv)")
      .createOrReplaceTempView("edge_rt")
    val got = one("SELECT count(rt.*) FROM edge_lt lt " +
      "LEFT JOIN edge_rt rt ON lt.lk = rt.rk")
    assert(got === 1L, s"count(rt.*) must skip null-extended rows: $got")
  }

  test("JSON_EXISTS: key present holding JSON null is TRUE " +
      "(present-with-null ≠ absent)") {
    assert(one("""SELECT JSON_EXISTS('{"a": null}', '$.a')""") === true)
    assert(one("""SELECT JSON_EXISTS('{"a": null}', '$.b')""") === false)
  }

  // ---- round-11 fixes (r10 ADVICE) ----

  test("WITH TIES keeps PG semantics through the scale-safe " +
      "threshold-then-filter shape (pg13_with_ties.sql:1-15 goldens)") {
    spark.sql("SELECT * FROM VALUES (10, 20), (11, 21), (12, 22), " +
      "(12, 22), (12, 22), (12, 23), (14, 24) AS t(a, b)")
      .createOrReplaceTempView("edge_wt")
    // OFFSET 1 skips the single 10; fetch 2 = 11, 12 + the tied 12s
    val g1 = rows("SELECT a FROM edge_wt ORDER BY a OFFSET 1 " +
      "FETCH FIRST 2 ROWS WITH TIES").map(_.head)
    assert(g1 === Seq(11, 12, 12, 12, 12), s"ASC offset ties: $g1")
    // DESC: 14 then the four tied 12s
    val g2 = rows("SELECT a FROM edge_wt ORDER BY a DESC " +
      "FETCH FIRST 2 ROWS WITH TIES").map(_.head)
    assert(g2 === Seq(14, 12, 12, 12, 12), s"DESC ties: $g2")
    // two-key: boundary ties on the FULL key list only
    val g3 = rows("SELECT a, b FROM edge_wt ORDER BY a, b OFFSET 1 " +
      "FETCH FIRST 2 ROWS WITH TIES")
    assert(g3 === Seq(Seq(11, 21), Seq(12, 22), Seq(12, 22), Seq(12, 22)),
      s"multi-key ties: $g3")
    // fewer rows than o+n → everything past the offset (PG contract)
    val g4 = rows("SELECT a FROM edge_wt WHERE a = 14 ORDER BY a " +
      "OFFSET 1 FETCH FIRST 5 ROWS WITH TIES").map(_.head)
    assert(g4 === Seq.empty, s"short input past offset: $g4")
    // the executed plan must carry the boundary pre-filter: a scalar
    // subquery whose inner plan is a distributed partial top-k —
    // NEVER a whole-input unpartitioned window
    val p = graft.plans.PlanChecks.executedPlan(PgDialect.sql(spark,
      "SELECT a FROM edge_wt ORDER BY a OFFSET 1 " +
        "FETCH FIRST 2 ROWS WITH TIES")).toString
    assert(p.contains("Subquery") || p.contains("subquery"),
      s"boundary scalar subquery missing from plan:\n$p")
  }

  test("enum min/max ordinal rewrite fires ONLY for the registered " +
      "owner table — a same-named column elsewhere keeps native min/max") {
    PgDialect.registerEnum("edge_mood", Seq("sad", "ok", "happy"))
    PgDialect.registerEnumColumn("edge_moods", "m", "edge_mood")
    spark.sql("SELECT * FROM VALUES ('sad'), ('happy'), ('ok') AS t(m)")
      .createOrReplaceTempView("edge_moods")
    // declaration order, not text order: max is 'happy'
    assert(one("SELECT max(m) FROM edge_moods") === "happy")
    assert(one("SELECT min(m) FROM edge_moods") === "sad")
    // same-named column in an UNRELATED table: plain text min/max —
    // the bare-name keyed rewrite used to throw element_at(arr, 0)
    spark.sql("SELECT * FROM VALUES ('zebra'), ('ant') AS t(m)")
      .createOrReplaceTempView("edge_words")
    assert(one("SELECT max(m) FROM edge_words") === "zebra")
    assert(one("SELECT min(m) FROM edge_words") === "ant")
  }

  test("percentile_cont: foldable literal fractions (0.5e0, " +
      "CAST(0.5 AS DOUBLE)) keep the NATIVE function; only genuine " +
      "group-key fractions take the collect_list interpolation") {
    assert(!PgDialect.translate(
      "SELECT percentile_cont(0.5e0) WITHIN GROUP (ORDER BY v) FROM t")
      .contains("collect_list"), "0.5e0 is foldable — keep native")
    assert(!PgDialect.translate("SELECT percentile_cont(" +
      "CAST(0.5 AS DOUBLE)) WITHIN GROUP (ORDER BY v) FROM t")
      .contains("collect_list"), "CAST literal is foldable — keep native")
    assert(PgDialect.translate("SELECT g, percentile_cont(g / 10.0) " +
      "WITHIN GROUP (ORDER BY v) FROM t GROUP BY g")
      .contains("collect_list"), "group-key fraction must interpolate")
  }

  test("percentile_cont with group-key fraction + FILTER clause: the " +
      "FILTER is consumed and honored (was dangling unparsable text)") {
    spark.sql("SELECT * FROM VALUES (5, 1.0), (5, 2.0), (5, 3.0), " +
      "(5, 100.0) AS t(g, v)").createOrReplaceTempView("edge_pc")
    // fraction g/10.0 = 0.5; FILTER drops 100.0 → median of {1,2,3} = 2
    val got = one("SELECT percentile_cont(g / 10.0) WITHIN GROUP " +
      "(ORDER BY v) FILTER (WHERE v < 50) FROM edge_pc GROUP BY g")
    assert(got === 2.0, s"filtered per-group median must be 2.0: $got")
  }

  test("JSON_VALUE dynamic PASSING path: variable $i must not split " +
      "a longer $idx occurrence, and spliced pieces escape quotes") {
    val t1 = PgDialect.translate("""SELECT JSON_VALUE('{"a": [10, 20]}',
      '$.a[$i]' PASSING 1 AS i)""")
    assert(t1.contains("get_json_object"), s"PASSING path not rewritten: $t1")
    assert(one("""SELECT JSON_VALUE('{"a": [10, 20]}',
      '$.a[$i]' PASSING 1 AS i)""") === "20")
    // $i inside $idx is NOT the variable: the splice must leave $idx
    // whole (the old raw split produced '$.' + i + 'dx' garbage)
    val t2 = PgDialect.translate(
      "SELECT JSON_VALUE(j, '$[$idx].x[$i]' PASSING 1 AS i) FROM t")
    assert(t2.contains("$[$idx].x["),
      s"longer variable $$idx must stay intact: $t2")
    // a piece holding a single quote must re-escape it ('' doubling)
    val t3 = PgDialect.translate(
      "SELECT JSON_VALUE(j, '$.o''brien[$i]' PASSING 0 AS i) FROM t")
    assert(t3.contains("'$.o''brien['") || t3.contains("o''brien"),
      s"embedded quote must stay doubled in the spliced piece: $t3")
  }

  private def lateralFixtures(): Unit = {
    spark.sql("SELECT * FROM VALUES (1, 10), (2, 20), (3, 30) " +
      "AS t(a, b)").createOrReplaceTempView("edge_lu1")
    spark.sql("SELECT * FROM VALUES (1, 5), (1, 15), (2, 25), (4, 40) " +
      "AS t(a, b)").createOrReplaceTempView("edge_lu2")
  }

  test("LATERAL JOIN USING, correlated body: rewrites to the ON form " +
      "Spark supports (PG reference: query_single_shard_table.sql)") {
    lateralFixtures()
    // per t1 row: lu2 rows with b > t1.a, then a-match; LEFT keeps
    // the a=3 miss → 2 + 1 + 1
    assert(one("SELECT COUNT(*) FROM edge_lu1 t1 LEFT JOIN LATERAL (" +
      "SELECT * FROM edge_lu2 t2 WHERE t2.b > t1.a) q USING(a)") === 4L)
    // INNER drops the miss → 3
    assert(one("SELECT COUNT(*) FROM edge_lu1 t1 JOIN LATERAL (" +
      "SELECT * FROM edge_lu2 t2 WHERE t2.b > t1.a) q USING(a)") === 3L)
  }

  test("LATERAL JOIN USING, uncorrelated body: de-LATERAL-izes so the " +
      "USING merge survives for an ENCLOSING USING on the same key " +
      "(recurring_outer_join.sql nested join tree)") {
    lateralFixtures()
    // t2 LEFT JOIN lu2 on a → 4 rows (a = 1,1,2,3 merged), then
    // JOIN t5 USING(a) keeps all 4 — ambiguity would error instead
    assert(one("SELECT COUNT(*) FROM edge_lu1 t2 LEFT JOIN LATERAL (" +
      "SELECT * FROM edge_lu2 t3) t4 USING(a) " +
      "JOIN edge_lu1 t5 USING(a)") === 4L)
  }

  test("LATERAL JOIN USING under a bare SELECT * does NOT rewrite — " +
      "the ON form would silently change the star-expanded column " +
      "set (USING merges the join column), so the loud error stays") {
    lateralFixtures()
    val ex = intercept[Throwable] {
      rows("SELECT * FROM edge_lu1 t1 LEFT JOIN LATERAL (" +
        "SELECT * FROM edge_lu2 t2 WHERE t2.b > t1.a) q USING(a)")
    }
    assert(Option(ex.getMessage)
        .exists(_.contains("LATERAL_JOIN_USING")),
      s"expected the unsupported-feature reject, got: ${ex.getMessage}")
  }

  test("outer reference in a scalar subquery's SELECT list hoists out " +
      "(PG evaluates it per outer row; Catalyst rejects the position)") {
    lateralFixtures()
    // e.a=1 → 1+1; e.a=2 → 2+2; e.a=3 → empty subquery → NULL
    val got = rows("SELECT (SELECT (SELECT e.a + a) FROM edge_lu2 " +
      "WHERE a = e.a GROUP BY a) FROM edge_lu1 e GROUP BY 1 ORDER BY 1")
    assert(got === Seq(Seq(2), Seq(4), Seq(null)),
      s"expected [2],[4],[null], got $got")
  }

  test("correlated scalar subquery projected from a grouped query " +
      "wraps in max() (value functionally dependent on the group key)") {
    lateralFixtures()
    assert(one("SELECT count(*) FROM (SELECT (SELECT sum(a) FROM " +
      "edge_lu2 WHERE a = u1.a GROUP BY a) FROM edge_lu1 u1 " +
      "GROUP BY a) foo") === 3L)
  }

  test("DISTINCT ON (k) * keeps the star (no alias) and EXCEPTs the " +
      "helper columns back out — first row per key, original schema") {
    lateralFixtures()
    // per a: first row by b asc → (1,5), (2,25), (4,40)
    val got = rows("SELECT DISTINCT ON (a) * FROM edge_lu2 " +
      "ORDER BY a, b")
    assert(got === Seq(Seq(1, 5), Seq(2, 25), Seq(4, 40)),
      s"expected first-per-key rows with 2 columns, got $got")
  }

  test("enum min/max owner-table rewrite is qualifier-AWARE: a " +
      "qualified column of an unrelated table keeps native min/max " +
      "even when the enum owner table appears in the statement") {
    spark.sql("SELECT * FROM VALUES ('zebra'), ('alpha') AS t(m)")
      .createOrReplaceTempView("edge_words")
    spark.sql("SELECT * FROM VALUES ('happy'), ('ok') AS t(m)")
      .createOrReplaceTempView("edge_moods")
    PgDialect.registerEnum("edge_mood", Seq("sad", "ok", "happy"))
    PgDialect.registerEnumColumn("edge_moods", "m", "edge_mood")
    // w qualifies edge_words — native string min, NOT label ordinals
    assert(one("SELECT min(w.m) FROM edge_words w, edge_moods") ===
      "alpha")
    // the owner table itself still folds through label order:
    // sad < ok < happy, so min({happy, ok}) = 'ok' (string min
    // would give 'happy')
    assert(one("SELECT min(m) FROM edge_moods") === "ok")
    // an alias OF the owner table resolves to it
    assert(one("SELECT min(q.m) FROM edge_moods q") === "ok")
  }

  test("plpgsql integer-division: `/` compiles to integral div when " +
      "every identifier is a declared integer parameter") {
    graft.sql.TableFunctions.registerFromCreate(
      "CREATE FUNCTION edge_div(thevalue integer) RETURNS integer " +
        "AS $fn$ BEGIN RETURN thevalue * 3 / 2 + 1; END; $fn$ " +
        "LANGUAGE plpgsql")
    // PG: 3*3/2+1 with integer division = 4+1 = 5 (double would be 5.5)
    assert(one("SELECT edge_div(3)").toString === "5")
  }

  test("date[] element normalization only fires on the unambiguous " +
      "MM-DD-YYYY spelling — PG REJECTS '20-05-2020' under MDY " +
      "rather than swapping fields") {
    spark.sql("SELECT CAST('2020-05-20' AS DATE) AS d")
      .createOrReplaceTempView("edge_dt")
    assert(one("SELECT d = ANY('{05-20-2020}'::date[]) FROM edge_dt")
      === true)
    // first field 20 is no month: the element must NOT silently
    // become May 20 — the untouched element reaches the CAST, which
    // rejects it (ANSI), exactly PG's own out-of-range error
    val ex = intercept[Throwable] {
      one("SELECT d = ANY('{20-05-2020}'::date[]) FROM edge_dt")
    }
    assert(Option(ex.getMessage)
        .exists(_.contains("CAST_INVALID_INPUT")),
      s"expected the cast reject, got: ${ex.getMessage}")
  }

  test("\"?column?\" reference aliasing covers the UNPARENTHESIZED " +
      "top-level SELECT too") {
    val got = one(
      "SELECT a + b FROM edge_gs ORDER BY \"?column?\" LIMIT 1")
    assert(got === 11, s"min anonymous sum must be 11: $got")
  }
}
