package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public front door routes to every subsystem. */
class FacadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("facade: topK and pgSql route through the engine") {
    val top = Graft.topK(
      Tables(spark, TestSpark.sf, "orders"),
      Seq(col("o_orderstatus")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 2)
    val counts = top.groupBy("o_orderstatus").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) <= 2))

    Tables.registerAll(spark, TestSpark.sf)
    val n = Graft.pgSql(spark,
      "SELECT o_orderkey::int8 AS k FROM orders WHERE o_orderstatus ~ '.'")
    assert(n.schema("k").dataType.typeName === "long")

    // subsystems resolve
    assert(Graft.catalog != null && Graft.dedup != null &&
      Graft.similarity != null && Graft.asof != null &&
      Graft.skew != null && Graft.dml != null && Graft.ingest != null &&
      Graft.streaming != null && Graft.multimodal != null)
  }
}
