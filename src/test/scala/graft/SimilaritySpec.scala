package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN invariants the oracle can't see: the IVF probe path must return
  * TRUE cosine scores (no approximation inside the probed cell) and
  * recall a useful share of the brute-force top-k. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ivf = SparkEntry.queries("sim_ivf_topk")(spark, TestSpark.sf)

  private def brute = {
    val e = Tables(spark, TestSpark.sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_vec"))
    e.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("q_vec")).as("cos"))
  }

  test("IVF probe returns exact cosines (bit-identical to brute force)") {
    val bf = brute.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = ivf.collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(bf(r.getLong(0)) === r.getDouble(1),
        s"vec ${r.getLong(0)}: probe cosine differs from brute force")
    }
    // sorted descending
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("IVF probe recalls most of the brute-force top-5") {
    val top = brute.orderBy(col("cos").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSet
    val got = ivf.collect().map(_.getLong(0)).toSet
    val recall = (top & got).size.toDouble / top.size
    assert(recall >= 0.6, s"recall@5 = $recall (single-probe IVF)")
  }
}
