package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join must produce exactly the plain join's result while
  * spreading the hot key across salt partitions. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted equi-join equals the plain join (skewed input)") {
    import spark.implicits._
    // 10k rows of one hot key + uniform tail
    val left = ((1 to 10000).map(i => (1L, s"hot_$i")) ++
      (1 to 500).map(i => (i.toLong % 50 + 2, s"cold_$i")))
      .toDF("k", "payload")
    val right = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = left.join(right, "k")
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", salt = 8)
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 10500)
  }

  test("key histogram surfaces the hot key first") {
    import spark.implicits._
    val df = (Seq.fill(1000)(7L) ++ (1L to 100L)).toDF("k")
    val top = SkewJoin.keyHistogram(df, col("k")).first()
    assert(top.getLong(0) === 7L && top.getLong(1) === 1001L)
  }
}
