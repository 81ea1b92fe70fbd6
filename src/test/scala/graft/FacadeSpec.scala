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
      Graft.streaming != null && Graft.multimodal != null &&
      Graft.rangeJoin != null && Graft.rebalancer != null &&
      Graft.stats != null)

    // parameterized PG SQL binds through the facade
    val p = Graft.pgSqlParams(spark,
      "SELECT count(*) AS n FROM orders WHERE o_custkey = $1", 7L)
    assert(p.collect()(0).getLong(0) ===
      Tables(spark, TestSpark.sf, "orders")
        .filter(col("o_custkey") === 7L).count())
  }

  test("explainAnalyze reports measured rows per node through the facade") {
    val df = Tables(spark, TestSpark.sf, "orders")
      .groupBy("o_orderstatus").count()
    val rep = Graft.explainAnalyze(df).collect()
    assert(rep.exists(r => r.getString(1).contains("FileSourceScan") &&
      r.getLong(2) > 0))
  }

  test("explainReport surfaces scans+pushdown, broadcasts, shuffles") {
    val q5 = SparkEntry.queries("q5_local_supplier")(spark, TestSpark.sf)
    val rep = Graft.explainReport(q5).collect()
    val kinds = rep.map(_.getString(1)).toSet
    assert(kinds.contains("scan") && kinds.contains("broadcast_join") &&
      kinds.contains("aggregate"))
    // scans report their read schema and pushed filters
    val scans = rep.filter(_.getString(1) == "scan")
    assert(scans.nonEmpty && scans.forall(_.getString(3).contains("schema=")))
  }
}
