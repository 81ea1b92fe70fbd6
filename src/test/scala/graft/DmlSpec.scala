package graft

import graft.catalog.DistributionCatalog
import graft.sources.Dml
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PG row semantics + copy-on-write layout preservation for the DML
  * surface (reference: merge_planner.c / multi_router_planner.c). */
class DmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("updateWhere: NULL condition leaves the row untouched (PG)") {
    val df = Seq((1, Some(10.0)), (2, None), (3, Some(60.0)))
      .toDF("id", "v")
    val out = Dml.updateWhere(df, col("v") > 50, Map("v" -> lit(-1.0)))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.get(1))).toSeq ===
      Seq(Some(10.0), None, Some(-1.0)))
  }

  test("deleteWhere: NULL condition keeps the row (PG)") {
    val df = Seq((1, Some(10.0)), (2, None), (3, Some(60.0)))
      .toDF("id", "v")
    val out = Dml.deleteWhere(df, col("v") > 50).orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2))
  }

  test("updateWhere assignments all read the pre-update row") {
    val df = Seq((1, 2.0, 3.0)).toDF("id", "a", "b")
    // swap a and b — only simultaneous (old-row) evaluation gives (3, 2)
    val out = Dml.updateWhere(df, lit(true),
      Map("a" -> col("b"), "b" -> col("a"))).collect().head
    assert((out.getDouble(1), out.getDouble(2)) === (3.0, 2.0))
  }

  test("merge covers all three row fates incl. matched-delete") {
    val target = Seq((1, "keep"), (2, "update-me"), (3, "delete-me"))
      .toDF("id", "v")
    val source = Seq((2, "updated", false), (3, "", true), (4, "inserted", false))
      .toDF("k", "nv", "del")
    val out = Dml.merge(target, source, "id", "k", Dml.MergeClauses(
        matchedUpdate = Map("v" -> col("s.nv")),
        matchedDelete = Some(col("s.del")),
        notMatchedInsert = Some(Map("id" -> col("s.k"), "v" -> col("s.nv")))))
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "keep"), (2, "updated"), (4, "inserted")))
  }

  test("merge without insert clause drops source-only rows") {
    val target = Seq((1, "a")).toDF("id", "v")
    val source = Seq((9, "x")).toDF("k", "nv")
    val out = Dml.merge(target, source, "id", "k",
      Dml.MergeClauses(matchedUpdate = Map("v" -> col("s.nv"))))
    assert(out.as[(Int, String)].collect().toSeq === Seq((1, "a")))
  }

  test("insertOnConflict: DO NOTHING keeps existing rows, DO UPDATE upserts") {
    val target = Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
    val source = Seq((2, 99.0), (3, 30.0)).toDF("id", "v")
    val nothing = Dml.insertOnConflictDoNothing(target, source, "id")
      .orderBy("id").as[(Int, Double)].collect().toSeq
    assert(nothing === Seq((1, 10.0), (2, 20.0), (3, 30.0)),
      "DO NOTHING must drop the conflicting source row")
    val upsert = Dml.insertOnConflictDoUpdate(target, source, "id",
        Map("v" -> col("s.v")))
      .orderBy("id").as[(Int, Double)].collect().toSeq
    assert(upsert === Seq((1, 10.0), (2, 99.0), (3, 30.0)),
      "DO UPDATE must take the proposed (excluded) row's value")
  }

  test("mergeIntoTable rewrites copy-on-write, keeping bucket layout") {
    DistributionCatalog.createDistributedTable(spark,
      Seq((1, 100.0), (2, 200.0)).toDF("id", "bal"), "dml_acct", "id",
      buckets = 4)
    val specBefore = DistributionCatalog.spec("dml_acct").get
    Dml.mergeIntoTable(spark, "dml_acct",
      Seq((2, 250.0), (3, 300.0)).toDF("k", "nb"), "k",
      Dml.MergeClauses(
        matchedUpdate = Map("bal" -> col("s.nb")),
        notMatchedInsert = Some(Map("id" -> col("s.k"), "bal" -> col("s.nb")))))
    val after = spark.table("dml_acct").orderBy("id")
      .as[(Int, Double)].collect().toSeq
    assert(after === Seq((1, 100.0), (2, 250.0), (3, 300.0)))
    val specAfter = DistributionCatalog.spec("dml_acct").get
    assert(specAfter.bucketCount === specBefore.bucketCount)
    assert(specAfter.distColumn === specBefore.distColumn)
  }
}
