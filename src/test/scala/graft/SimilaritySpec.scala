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

  test("IVF-PQ ADC beats chance: its top-10 overlaps the exact " +
      "within-cell top-10 and selects genuinely closer vectors than " +
      "the cell average (4-codeword codebook is deliberately coarse)") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.DoubleType
    val e = Tables(spark, TestSpark.sf, "embeddings")
    def l2(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
      }), lit(0.0), (acc, v) => acc + v)
    // exact squared-L2 within the query's coarse cell (same 4-centroid
    // quantizer the ADC query probes)
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val cells = e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(Similarity.dot(col("embedding"), col("c_vec")).as("score"),
          (-col("c_id")).as("negidx")).as("sc"))
      .groupBy(col("vec_id"))
      .agg((-max(col("sc")).getField("negidx")).as("cell"))
    val withCell = e.join(cells, "vec_id")
    val q = withCell.filter(col("vec_id") === 0)
      .select(col("cell").as("q_cell"), col("embedding").as("q_vec"))
    val exact = withCell.crossJoin(broadcast(q))
      .filter(col("cell") === col("q_cell") && col("vec_id") =!= 0)
      .select(col("vec_id"), l2(col("embedding"), col("q_vec")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactTop10 = exact.toSeq.sortBy { case (id, d) => (d, id) }
      .take(10).map(_._1).toSet
    val adcTop10 = SparkEntry.queries("sim_ivfpq_topk")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSeq
    assert(adcTop10.length === 10)
    // approximate search must beat chance on the fixed corpus: ≥2 of
    // the exact top-10 recalled (chance expectation ~0.9 of 10 at
    // |cell| ≈ 110), and the TRUE distance of its picks beats the
    // cell average
    val overlap = (adcTop10.toSet & exactTop10).size
    assert(overlap >= 2, s"ADC top-10 recalled only $overlap of exact top-10")
    val adcTrueAvg = adcTop10.map(exact).sum / adcTop10.length
    val cellAvg = exact.values.sum / exact.size
    assert(adcTrueAvg < cellAvg,
      f"ADC picks are not closer than average: $adcTrueAvg%.4f vs $cellAvg%.4f")
  }
}
