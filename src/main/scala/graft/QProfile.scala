package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off micro-profile: q1 aggregation in decimal vs long-cents vs
  * raw double (not part of the driver contract). */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cached = Tables(spark, sfDir, "lineitem").cache()
    cached.count() // materialize
    val li = () => cached
      .filter(col("l_shipdate") <= Dsl.ts("1998-09-02"))

    def dec = li().groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      sum(col("l_quantity").cast(DecimalType(12, 2))).as("a"),
      sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))).as("b"),
      count(lit(1)).as("c"))

    def cents = li().groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      sum(round(col("l_quantity") * 100).cast(LongType)).as("a"),
      sum(round(col("l_extendedprice") * 100).cast(LongType) *
        round((lit(1.0) - col("l_discount")) * 100).cast(LongType)).as("b"),
      count(lit(1)).as("c"))

    def dbl = li().groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      sum(col("l_quantity")).as("a"),
      sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("b"),
      count(lit(1)).as("c"))

    def scanOnly = li().agg(count(col("l_extendedprice")))

    val cases = Seq("dec" -> (() => dec), "cents" -> (() => cents),
      "dbl" -> (() => dbl), "scan" -> (() => scanOnly))
    (1 to 2).foreach(_ => cases.foreach(_._2().write.format("noop")
      .mode("overwrite").save()))
    cases.foreach { case (n, f) =>
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ =>
        f().write.format("noop").mode("overwrite").save())
      println(f"PROF $n%-6s ${(System.nanoTime() - t0) / 5e9}%6.3f s/run")
    }
    spark.stop()
  }
}
