package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Dsl.ts

/** Dev tool (round 13, not part of the driver contract): interleaved A/B
  * of the fixed-point money path. `round(x*100)` on DoubleType codegens
  * to a per-row java.math.BigDecimal.setScale (RoundBase), allocating on
  * every row of every money column; `floor(x*100 + 0.5)` is pure fused
  * double arithmetic (guide §4: built-in, codegen-friendly expressions in
  * the hot path). For positive 2-decimal money data the two are equal:
  * the true value is an integer in cents and |fp error| ≪ 0.5, so
  * HALF_UP-round and floor(+0.5) pick the same integer. Also checks the
  * equality exhaustively on the bench data before timing.
  */
object CentsTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cents-tune")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.pinForBench(spark, sfDir)
    def t(n: String): DataFrame = Tables(spark, sfDir, n)

    def centsOld(c: Column): Column = round(c * 100).cast(LongType)
    def centsNew(c: Column): Column = floor(c * 100 + 0.5).cast(LongType)

    // --- exactness: old vs new on every money column of lineitem -------
    val li = t("lineitem")
    val diffs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map { c =>
        val base = li.select(col(c).as("v"))
          .union(li.select((lit(1.0) - col(c)).as("v")))
          .union(li.select((lit(1.0) + col(c)).as("v")))
        c -> base.filter(centsOld(col("v")) =!= centsNew(col("v"))).count()
      }
    println("EXACT " + diffs.map { case (c, d) => s"$c=$d" }.mkString(" "))

    def q1With(cents: Column => Column): DataFrame = {
      def oneMinusCents(c: Column) = cents(lit(1.0) - c)
      def onePlusCents(c: Column) = cents(lit(1.0) + c)
      def moneySum(c: Column) = sum(cents(c)).cast(DoubleType) / 100
      def moneyAvg(c: Column) = sum(cents(c)).cast(DoubleType) / 100 / count(c)
      li.filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          (sum(cents(col("l_extendedprice")) * oneMinusCents(col("l_discount")))
            .cast(DoubleType) / 10000).as("sum_disc_price"),
          (sum(cents(col("l_extendedprice")) * oneMinusCents(col("l_discount")) *
            onePlusCents(col("l_tax"))).cast(DoubleType) / 1000000).as("sum_charge"),
          moneyAvg(col("l_quantity")).as("avg_qty"),
          moneyAvg(col("l_extendedprice")).as("avg_price"),
          moneyAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }

    def largeWith(cents: Column => Column): DataFrame = {
      def oneMinusCents(c: Column) = cents(lit(1.0) - c)
      t("orders")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          (sum(cents(col("l_extendedprice")) * oneMinusCents(col("l_discount")))
            .cast(DoubleType) / 10000).as("revenue"))
        .orderBy(col("o_orderstatus"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q1_old" -> (() => q1With(centsOld)),
      "q1_new" -> (() => q1With(centsNew)),
      "large_old" -> (() => largeWith(centsOld)),
      "large_new" -> (() => largeWith(centsNew)))

    (1 to 4).foreach(_ => variants.foreach(_._2().write.format("noop")
      .mode("overwrite").save()))
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to 9).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (n, _) =>
      val s = samples(n).sorted
      println(f"TUNE $n%-10s median=${s(s.size / 2)}%6.4f min=${s.head}%6.4f max=${s.last}%6.4f")
    }
    spark.stop()
  }
}
