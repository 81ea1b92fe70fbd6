package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe (not part of the driver contract): measure what the
  * bucketed colocated layout is worth on the fact-fact join, vs the
  * same join on plain parquet. This is the LOCAL_PARTITION_JOIN payoff
  * the catalog exists for — CatalogSpec pins the zero-exchange plan
  * shape; this probe pins the number that plan shape buys.
  */
object ColocationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val wh = java.nio.file.Files.createTempDirectory("graft_coloc").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-coloc-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ/SHJ
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    graft.catalog.DistributionCatalog.createDistributedTable(
      spark, orders, "cp_orders", "o_orderkey", buckets = 16)
    graft.catalog.DistributionCatalog.createDistributedTable(
      spark, lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "cp_lineitem", "o_orderkey", buckets = 16,
      colocateWith = Some("cp_orders"))

    def joinAgg(o: org.apache.spark.sql.DataFrame,
        l: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      o.join(l, "o_orderkey")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

    val plain = () => joinAgg(
      orders.select("o_orderkey", "o_orderstatus"),
      lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")))
    val bucketed = () => joinAgg(
      spark.table("cp_orders").select("o_orderkey", "o_orderstatus"),
      spark.table("cp_lineitem").select("o_orderkey", "l_quantity"))

    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      graft.plans.PlanChecks.countShuffles(df)
    println(s"PROBE plan shuffles: plain=${shuffles(plain())} " +
      s"bucketed=${shuffles(bucketed())}")

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then interleave timed runs
    (1 to 3).foreach { _ => time(plain); time(bucketed) }
    val runs = (1 to 5).map(_ => (time(plain), time(bucketed)))
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"PROBE join med: plain=${med(runs.map(_._1))}%.3f s " +
      f"bucketed=${med(runs.map(_._2))}%.3f s  (sf=$sfDir, 16 buckets, " +
      "broadcast off, AQE off)")
    spark.stop()
  }
}
