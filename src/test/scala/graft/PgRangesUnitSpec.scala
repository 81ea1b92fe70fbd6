package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{PgRanges, JsonbOps}

/** Unit pins for the range/multirange constant algebra and the jsonb
  * canonical model (pg14.sql's nummultirange + test_jsonb_subscript
  * batteries, reference src/test/regress/sql/pg14.sql:418-615). */
class PgRangesUnitSpec extends AnyFunSuite {

  test("multirange text canonicalization (pg14 inserts)") {
    // the rewrite fast-path guard keys on "range" appearing in the
    // statement — true for every real corpus statement (the table
    // name is nummultirange_test)
    def rw(s: String) =
      PgRanges.rewrite("INSERT INTO nummultirange_test " + s)
    assert(rw("VALUES('{[, 5)}')").contains("'{(,5)}'"))
    assert(rw("VALUES('{[,)}')").contains("'{(,)}'"))
    assert(rw("VALUES('{[3,]}')").contains("'{[3,)}'"))
    assert(rw("VALUES('{empty}')").contains("'{}'"))
    assert(rw("VALUES('{}')").contains("'{}'"))
  }

  test("multirange constructor folding (pg14 inserts)") {
    def rw(s: String) = PgRanges.rewrite(s)
    assert(rw("SELECT nummultirange()").contains("'{}'"))
    assert(rw("SELECT nummultirange(variadic '{}'::numrange[])")
      .contains("'{}'"))
    assert(rw("SELECT nummultirange(numrange(1.1, 2.2))")
      .contains("'{[1.1,2.2)}'"))
    // adjacent ranges merge; disjoint ones stay separate
    assert(rw("SELECT nummultirange(numrange(1.7, 1.7, '[]'), " +
      "numrange(1.7, 1.9))").contains("'{[1.7,1.9)}'"))
    assert(rw("SELECT nummultirange(numrange(1.7, 1.7, '[]'), " +
      "numrange(1.9, 2.1))").contains("'{[1.7,1.7],[1.9,2.1)}'"))
    assert(rw("SELECT nummultirange(numrange(1.1, 2.2,'()'))")
      .contains("'{(1.1,2.2)}'"))
  }

  test("jsonb canonical render: key order (length, bytes), spacing") {
    assert(JsonbOps.set("""{"a": [1, 2, 3], "key": "value"}""",
      "another_key", null) ===
      """{"a": [1, 2, 3], "key": "value", "another_key": null}""")
    assert(JsonbOps.set(null, "a", "1") === """{"a": 1}""")
    assert(JsonbOps.set(null, "0", "1") === "[1]")
    assert(JsonbOps.set("""{"a": 1}""", "0", "1") ===
      """{"0": 1, "a": 1}""")
    assert(JsonbOps.set("""{}""", "a", "\"test\"") ===
      """{"a": "test"}""")
    assert(JsonbOps.set("""{"key": "value"}""", "a",
      """{"b": 1}""") === """{"a": {"b": 1}, "key": "value"}""")
  }

  test("jsonb subscript reads render member as jsonb text") {
    assert(JsonbOps.get("""{"key": "value"}""", "key") === "\"value\"")
    assert(JsonbOps.get("""{"key": "value"}""", "nope") === null)
    assert(JsonbOps.get("""{"a": [1, 2, 3]}""", "a") === "[1, 2, 3]")
    assert(JsonbOps.get("""[5, 6]""", "1") === "6")
    assert(JsonbOps.get(null, "k") === null)
  }

  test("jsonpath $.** recursive descent: first match in document " +
      "order, through arrays, present-with-null ≠ absent (pg18.sql " +
      "wal_explain battery)") {
    val plan = """[{"Plan": {"Node Type": "Custom Scan",
      "Task Count": 4, "WAL Buffers Full": 0,
      "Plans": [{"Node Type": "Aggregate", "Task Count": 9}]}}]"""
    assert(JsonbOps.descendFirst(plan, "Task Count") === "4")
    assert(JsonbOps.descendFirst(plan, "WAL Buffers Full") === "0")
    assert(JsonbOps.descendFirst(plan, "Node Type") ===
      "\"Custom Scan\"")
    assert(JsonbOps.descendFirst(plan, "Missing Key") === null)
    // a key HOLDING JSON null is present (PG jsonb_path_exists = t):
    // the walker returns the rendered text "null", not SQL NULL
    assert(JsonbOps.descendFirst("""{"a": {"b": null}}""", "b") ===
      "null")
    assert(JsonbOps.descendFirst(null, "k") === null)
  }
}
