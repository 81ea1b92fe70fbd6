package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.PgRanges
import graft.sql.PgRanges._

/** Pure-JVM pins for the PG range algebra (no Spark session): the
  * constant-folding semantics behind sqlancer_failures.sql's
  * int4range battery and pg14/pg15's numrange/multirange corpus. */
class PgRangesSpec extends AnyFunSuite {

  private def r(kind: String, txt: String): PgRange =
    parseRangeText(kind, txt).get

  test("int4range canonicalization: bounds normalize to [lo,hi)") {
    assert(render("int", r("int", "(0,5]")) == "[1,6)")
    assert(render("int", r("int", "[3,3)")) == "empty")
    assert(render("int", r("int", "[,5)")) == "(,5)")
    assert(render("int", r("int", "[3,]")) == "[3,)")
  }

  test("intersection / union / difference") {
    assert(render("int", intersect(r("int", "[1,5)"), r("int", "[3,9)")))
      == "[3,5)")
    assert(intersect(r("int", "[1,3)"), r("int", "[5,9)")).isEmpty)
    assert(union(r("int", "[1,3)"), r("int", "[3,5)"))
      .map(render("int", _)).contains("[1,5)"))
    assert(union(r("int", "[1,3)"), r("int", "[7,9)")).isEmpty) // PG ERROR
    assert(minus(r("int", "[1,9)"), r("int", "[5,20)"))
      .map(render("int", _)).contains("[1,5)"))
    assert(minus(r("int", "[1,9)"), r("int", "[3,5)")).isEmpty) // split
    // non-overlapping subtrahend leaves the range unchanged (the
    // sqlancer statement's shape)
    assert(minus(r("int", "[832125354,1134163512)"),
      r("int", "(-600267905,509840582]"))
      .map(render("int", _)).contains("[832125354,1134163512)"))
  }

  test("boolean operators incl. empty-range conventions") {
    assert(overlaps(r("int", "(0,5]"), r("int", "[5,9)")))
    assert(!overlaps(r("int", "[1,5)"), r("int", "[5,9)")))
    assert(adjacent(r("int", "[1,3)"), r("int", "[3,5)")))
    assert(containsRange(r("int", "[1,9)"), r("int", "[3,5)")))
    assert(containsRange(r("int", "[1,9)"), Empty)) // any @> empty
    assert(containsElem(r("num", "[1.5,2.5)"), BigDecimal("1.5")))
    assert(!containsElem(r("num", "(1.5,2.5)"), BigDecimal("1.5")))
    assert(notExtRight(r("int", "[1,5)"), r("int", "[2,9)"))) // &<
    assert(!notExtRight(Empty, r("int", "[2,9)"))) // empty → false
    assert(strictlyLeft(r("int", "[1,3)"), r("int", "[3,5)")))
  }

  test("numrange keeps continuous bounds; multirange normalizes") {
    assert(render("num", r("num", "[1.1,2.2)")) == "[1.1,2.2)")
    // {[1.7,1.7], [1.7,1.9)} merges (pg14.sql:597)
    assert(renderMulti("num", Seq(
      parseRangeText("num", "[1.7,1.7]").get,
      parseRangeText("num", "[1.7,1.9)").get)) == "{[1.7,1.9)}")
    // disjoint stays two items (pg14.sql:598)
    assert(renderMulti("num", Seq(
      parseRangeText("num", "[1.7,1.7]").get,
      parseRangeText("num", "[1.9,2.1)").get))
      == "{[1.7,1.7],[1.9,2.1)}")
    assert(parseMultiText("num", "{empty}").map(normalizeMulti)
      .contains(Seq.empty))
    // array text never parses as a multirange
    assert(parseMultiText("num", "{1,2,3}").isEmpty)
  }

  test("range_agg finisher: merge, null group, date autodetect") {
    assert(rangeAggFinish(Seq("[2018-07-01,2018-07-07)",
      "[2018-07-07,2018-07-14)", "[2018-07-20,2018-07-22)"))
      == "{[2018-07-01,2018-07-14),[2018-07-20,2018-07-22)}")
    assert(rangeAggFinish(Seq.empty) == null)
    assert(rangeAggFinish(Seq("empty")) == "{}")
  }

  test("dialect rewrite folds the sqlancer operator chain") {
    val folded = PgRanges.rewrite(
      "SELECT '[1,5)'::int4range * '[3,9)'::int4range, " +
        "'[1,3)'::int4range -|- '[3,5)'::int4range")
    assert(folded == "SELECT '[3,5)', TRUE")
    val rt = PgRanges.rewrite(
      "SELECT * FROM t WHERE int4range(2, 5) @> l_linenumber")
    assert(rt.contains("l_linenumber >= 2") &&
      rt.contains("l_linenumber < 5"))
  }
}
