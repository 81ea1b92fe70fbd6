package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-12/13 analysis-failure fallbacks and textual
  * rewrites, including the round-13 advisory hardenings:
  *  - hoistScalarSelectOuterRefs multi-row semantics: PG raises
  *    "more than one row returned by a subquery used as an
  *    expression"; the ungrouped hoist must reproduce that error via
  *    its count guard instead of silently max-folding (r12 advisory
  *    finding; reference src/test/regress/sql/
  *    query_single_shard_table.sql:1555-1574 is the exact-valued
  *    corpus shape).
  *  - rewriteSrfValues multi-tuple VALUES lists: plain tuples after
  *    the series tuple must survive (r13 advisory medium).
  *  - rewriteRecursiveUnion: `UNION DISTINCT` spelling strips the
  *    DISTINCT with the UNION (r13 advisory low).
  * Lives in package graft.sql to reach the private[sql] fallbacks
  * directly — the main pipeline only routes here on Catalyst
  * analysis failures, which need the full nested corpus shapes to
  * trigger.
  */
class PgDialectHoistSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("hoistScalarSelectOuterRefs: ungrouped rest gets the count " +
      "guard; grouped rest keeps plain max (Spark's own multi-row " +
      "check covers it)") {
    val ungrouped = PgDialect.hoistScalarSelectOuterRefs(
      "SELECT o.id, (SELECT o.c + v FROM r WHERE r.id = o.id) FROM o")
    assert(ungrouped.contains("count(*) > 1") &&
      ungrouped.contains("raise_error") &&
      ungrouped.contains("max(v)"),
      s"ungrouped hoist must guard with count(*): $ungrouped")
    val grouped = PgDialect.hoistScalarSelectOuterRefs(
      "SELECT o.id, (SELECT o.c + v FROM r WHERE r.id = o.id " +
        "GROUP BY v) FROM o")
    assert(grouped.contains("(SELECT max(v) FROM r") &&
      !grouped.contains("raise_error"),
      s"grouped hoist must stay a bare max: $grouped")
  }

  test("hoisted ungrouped subquery: single-row per outer key is " +
      "exact, empty is NULL, multi-row raises PG's runtime error " +
      "instead of silently folding to max") {
    spark.sql("SELECT * FROM VALUES (1, 10), (2, 20), (3, 30) " +
      "AS o(id, c)").createOrReplaceTempView("hoist_o")
    // id=1 → one row; id=2 → TWO rows (PG errors); id=3 → none (NULL)
    spark.sql("SELECT * FROM VALUES (1, 100), (2, 200), (2, 300) " +
      "AS r(id, v)").createOrReplaceTempView("hoist_r")
    val run = PgDialect.hoistScalarSelectOuterRefs(
      "SELECT o.id, (SELECT o.c + v FROM hoist_r WHERE " +
        "hoist_r.id = o.id) AS x FROM hoist_o o")
    assert(run.contains("raise_error"), s"hoist must fire: $run")
    val single = spark.sql(run)
      .where("id IN (1, 3)").orderBy("id").collect().map(_.toSeq)
    assert(single.toSeq === Seq(Seq(1, 110), Seq(3, null)),
      s"single-row hoist must be exact and empty must be NULL: " +
        single.toSeq)
    val ex = intercept[Throwable] {
      spark.sql(run).where("id = 2").collect()
    }
    val msg = Option(ex.getMessage).getOrElse("")
    assert(msg.contains("more than one row returned by a subquery"),
      s"multi-row must reproduce PG's error, got: ${msg.take(200)}")
  }

  test("rewriteSrfValues: a multi-tuple VALUES list keeps its plain " +
      "tuples as UNION ALL branches") {
    val got = PgDialect.rewriteSrfValues(
      "SELECT * FROM (VALUES (generate_series(1,3), 'x'), (5, 'y')) " +
        "AS v(a, b) ORDER BY a")
    assert(got.contains("UNION ALL SELECT 5, 'y'"),
      s"second tuple must survive: $got")
    val rows = spark.sql(got).collect().map(_.toSeq).toSeq
    assert(rows === Seq(Seq(1, "x"), Seq(2, "x"), Seq(3, "x"),
      Seq(5, "y")), s"expected the 4 expanded rows, got $rows")
    // the series tuple may sit SECOND too
    val got2 = PgDialect.rewriteSrfValues(
      "SELECT * FROM (VALUES (5, 'y'), (generate_series(1, 2), 'x')) " +
        "AS v(a, b) ORDER BY a")
    val rows2 = spark.sql(got2).collect().map(_.toSeq).toSeq
    assert(rows2 === Seq(Seq(1, "x"), Seq(2, "x"), Seq(5, "y")),
      s"series-second expansion wrong: $rows2")
    // a non-tuple-list shape after the first tuple must NOT fire
    // (nothing silently dropped)
    val odd = "SELECT * FROM (VALUES (generate_series(1,3)) " +
      "UNION SELECT 9) v(a)"
    assert(PgDialect.rewriteSrfValues(odd) === odd,
      "non-tuple-list tail must leave the statement untouched")
  }

  test("rewriteRecursiveUnion strips an explicit DISTINCT with the " +
      "UNION it modifies") {
    val got = PgDialect.rewriteRecursiveUnion(
      "WITH RECURSIVE r(n) AS ( SELECT 1 UNION DISTINCT " +
        "SELECT n + 1 FROM r WHERE n < 3 ) SELECT * FROM r")
    assert(got.contains("UNION ALL SELECT n + 1") &&
      !got.toUpperCase.contains("DISTINCT"),
      s"UNION DISTINCT must become plain UNION ALL: $got")
  }

  test("composite paren-strip is lookbehind-guarded: fn(x).field " +
      "keeps its call shape while (x).field still strips") {
    PgDialect.registerCompositeType("hoist_ct",
      Seq(("x", "int"), ("y", "int")))
    try {
      val kept = PgDialect.translate("SELECT fn(t).x FROM s")
      assert(kept.contains("fn(t).x"),
        s"composite-returning call access must not mangle: $kept")
      val stripped = PgDialect.translate("SELECT (t).x FROM s")
      assert(stripped.contains("SELECT t.x"),
        s"paren-wrapped column access must strip: $stripped")
    } finally PgDialect.clearTypes()
  }

  test("bare whole-row select item rewrites ONLY at the top level " +
      "of the select list — call arguments and GROUP BY names stay") {
    val item = PgDialect.translate("SELECT y, t FROM t")
    assert(item.contains("struct(t.*)"),
      s"top-level whole-row item must struct-ify: $item")
    val arg = PgDialect.translate("SELECT coalesce(a, t, b) FROM t")
    assert(arg.contains("coalesce(a, t, b)"),
      s"a call-argument name must NOT struct-ify: $arg")
    val grp = PgDialect.translate("SELECT a FROM t GROUP BY a, t")
    assert(grp.contains("GROUP BY a, t"),
      s"a GROUP BY name must NOT struct-ify: $grp")
  }
}
