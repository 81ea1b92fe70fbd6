package graft

import org.apache.spark.sql.SparkSession

/** One-off micro-profile (not part of the driver contract): the REAL
  * bench queries, timed within one JVM across {cache partition count} ×
  * {serializer} to explain the Bench regression that QProfile's
  * simplified q1 didn't show. */
object QProfile {
  def timeSet(spark: SparkSession, sfDir: String, parts: Int): Double = {
    Tables.unpin()
    spark.catalog.clearCache()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { n =>
      val base = spark.read.parquet(s"$sfDir/$n.parquet")
      val df = (if (Seq("lineitem", "orders").contains(n) && parts > 1)
                  base.repartition(parts)
                else base).cache()
      df.count()
      Tables.pin((sfDir, n), df)
    }
    val names = SparkEntry.benchQueries
    val qmap = SparkEntry.queries
    (1 to 2).foreach(_ => names.foreach { n =>
      qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    })
    val t0 = System.nanoTime()
    (1 to 3).foreach(_ => names.foreach { n =>
      qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    })
    (System.nanoTime() - t0) / 3e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val kryo = sys.env.getOrElse("GRAFT_KRYO", "1") == "1"
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (kryo) b.config("spark.serializer",
      "org.apache.spark.serializer.KryoSerializer")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq(1, 8, 1, 8).foreach { p =>
      val s = timeSet(spark, sfDir, p)
      println(f"PROF kryo=$kryo parts=$p%-2d total=${s}%6.3f s/set")
    }
    spark.stop()
  }
}
