package graft

import org.apache.spark.sql.SparkSession

/** Config-sweep harness for Bench tuning (not part of the driver
  * contract). Usage: runMain graft.BenchTune */
object BenchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val variants: Seq[(String, Map[String, String])] = Seq(
      "bench_current" -> Map(
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true"),
      "kryo" -> Map(
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer"),
      "bcast64m" -> Map(
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "64m"),
      "cache_uncompressed" -> Map(
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.inMemoryColumnarStorage.compressed" -> "false"),
      "all3" -> Map(
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.autoBroadcastJoinThreshold" -> "64m",
        "spark.sql.inMemoryColumnarStorage.compressed" -> "false"))

    val names = SparkEntry.benchQueries
    variants.foreach { case (label, conf) =>
      val b = SparkSession.builder().master("local[32]")
        .appName(s"graft-tune-$label")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      conf.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val qmap = SparkEntry.queries
      Tables.pinForBench(spark, sfDir)
      // warm twice (JIT + codegen + footer caches)
      (1 to 2).foreach(_ => names.foreach(n =>
        qmap(n)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()))
      val t0 = System.nanoTime()
      val per = names.map { n =>
        val s = System.nanoTime()
        qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        n -> (System.nanoTime() - s) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"TUNE $label%-18s total=$total%6.3f  " +
        per.map { case (n, t) => f"${n.take(8)}=$t%5.3f" }.mkString(" "))
      Tables.unpin()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
