package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy/semantics specs for the sketch aggregates (approximate ops
  * that the DuckDB oracle can't hash-check). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("topn with ample capacity is exactly the grouped counts") {
    val topn = udaf(new Sketches.TopNAgg(3, 64))
    val got = Tables(spark, TestSpark.sf, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(topn(col("o_orderpriority")).as("t"))
      .select(col("o_orderstatus"), explode(col("t")).as("e"))
      .select(col("o_orderstatus"), col("e.item"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val exact = Tables(spark, TestSpark.sf, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority")).count()
      .withColumn("rn", expr(
        """row_number() over (partition by o_orderstatus
           order by count desc, o_orderpriority)"""))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), col("o_orderpriority"), col("count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === exact)
  }

  test("topn under capacity pressure still surfaces the heavy hitter") {
    import spark.implicits._
    // 1000 of 'hot', 1..5 of 200 cold keys — capacity 16 forces eviction.
    val data = (Seq.fill(1000)("hot") ++
      (1 to 200).flatMap(i => Seq.fill(1 + i % 5)(s"cold_$i"))).toDF("k")
    val topn = udaf(new Sketches.TopNAgg(1, 16))
    val top = data.agg(topn(col("k"))).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).head
    assert(top.getString(0) === "hot")
  }

  test("tdigest percentiles within 2% relative error of exact") {
    val td = udaf(new Sketches.TDigestAgg(100, Seq(0.5, 0.95, 0.99)))
    val li = Tables(spark, TestSpark.sf, "lineitem")
    val approx = li.agg(td(col("l_extendedprice"))).collect()(0)
      .getSeq[Double](0)
    val exact = li.agg(
      expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))"))
      .collect()(0).getSeq[Double](0)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e")
    }
  }

  test("hll sketch union estimate within 5% of exact distinct") {
    val o = Tables(spark, TestSpark.sf, "orders")
    val est = o.groupBy(col("o_orderstatus"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
      .collect()(0).getLong(0)
    val exact = o.agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"hll estimate $est vs exact $exact")
  }

  test("persisted HLL sketch columns roll up across days " +
      "(citus rollup-table pattern, binary column survives parquet)") {
    val o = Tables(spark, TestSpark.sf, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit("1996-03-01")))
    // per-day rollup table with a BINARY sketch column, persisted
    val rollup = o.groupBy(col("o_orderdate"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_rollup").toString
    rollup.write.mode("overwrite").parquet(path)
    // later query: distinct customers over the whole range, answered
    // from the persisted sketches alone — no rescan of raw orders
    val est = spark.read.parquet(path)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
      .collect()(0).getLong(0)
    val exact = o.agg(countDistinct(col("o_custkey")))
      .collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"rolled-up estimate $est vs exact $exact")
  }

  test("weighted avg aggregator matches the exact formula") {
    val wavg = udaf(new Sketches.WeightedAvgAgg)
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .select(col("l_quantity").cast(LongType).as("w"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast(LongType).as("cents"))
    val got = li.agg(wavg(col("w"), col("cents"))).collect()(0).getDouble(0)
    val row = li.agg(sum(col("w") * col("cents")), sum(col("w")))
      .collect()(0)
    val want = (row.getLong(0).toDouble / row.getLong(1)) / 100.0
    assert(got === want)
  }
}
