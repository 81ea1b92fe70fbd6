package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round 13, not part of the driver contract): attribute
  * sketch_tdigest_percentile's residual cost — the t-digest UDAF build
  * vs the exact-percentile verdict buffer — by timing each aggregate
  * alone over the same scan (same session config as Bench).
  */
object SketchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sketch-tune")
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
    def li: DataFrame = Tables(spark, sfDir, "lineitem")

    val td = udaf(new graft.functions.Sketches.TDigestAgg(
      100, Seq(0.5, 0.95, 0.99)))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "digest_only" -> (() => li.groupBy(col("l_returnflag"))
        .agg(td(col("l_extendedprice")).as("qs"))),
      "pct_only" -> (() => li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
          .as("es"))),
      "count_only" -> (() => li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))),
      // frequency form: pre-count per (group, value) in a codegen hash
      // aggregate, then feed Percentile (value, count) pairs — it
      // builds the IDENTICAL counts map, so the interpolated result is
      // bit-identical; the per-row boxed-map update moves to a
      // primitive hash agg.
      "pct_freq" -> (() => li
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "percentile(l_extendedprice, array(0.5, 0.95, 0.99), cnt)")
          .as("es"))),
      "distinct_prices" -> (() => li
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))),
      // exact multi-distinct: Spark's native Expand plan (×4 rows
      // through two aggregate layers) vs one grouped pre-aggregation
      // per distinct spec joined on the group key.
      "cd_native" -> (() => li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_partkey"), col("l_suppkey"))
            .as("n_part_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))),
      "cd_split" -> (() => {
        def dcount(cols: Seq[String], as: String) = li
          .groupBy((col("l_returnflag") +: cols.map(col)): _*)
          .agg(count(lit(1)).as("__c"))
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
        val base = li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"))
        dcount(Seq("l_partkey"), "n_parts")
          .join(dcount(Seq("l_suppkey"), "n_supps"), "l_returnflag")
          .join(dcount(Seq("l_partkey", "l_suppkey"), "n_part_supp"),
            "l_returnflag")
          .join(base, "l_returnflag")
          .select(col("l_returnflag"), col("n_parts"), col("n_supps"),
            col("n_part_supp"), col("n_rows"))
          .orderBy(col("l_returnflag"))
      }))
    (1 to 3).foreach(_ => variants.foreach(_._2().write.format("noop")
      .mode("overwrite").save()))
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to 7).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (n, _) =>
      val s = samples(n).sorted
      println(f"TUNE $n%-12s median=${s(s.size / 2)}%6.4f min=${s.head}%6.4f max=${s.last}%6.4f")
    }
    spark.stop()
  }
}
