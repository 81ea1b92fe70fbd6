package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round 14, not part of the driver contract): per-query A/B
  * of the bench set across {fact-cache partition count} × {shuffle
  * partitions}, in ONE JVM, medians over several interleaved passes.
  *
  * Motivation (guide §1/§2): the sf0.1 parquet files hold ONE row group
  * each, so the scan cannot split below one real task no matter what
  * maxPartitionBytes says — every map stage over lineitem is effectively
  * single-threaded (StageProfile r14: tasks=3 but one task carries all
  * 600k rows). The only way to parallelize the map side locally is to
  * repartition the CACHE at pin time. The r13 QProfile sweep only ever
  * combined parts>1 with shuffle=8, which independently costs ~0.4 s/set
  * — this harness isolates the two axes.
  */
object PartTune {
  /** parts > 0: repartition lineitem+orders to exactly `parts`.
    * parts == -1: bytes-proportional per table — clamp(fileBytes/1.25MB,
    * 1, 32) (lineitem ≈ 9, orders ≈ 2, dims stay 1). */
  def repin(spark: SparkSession, sfDir: String, parts: Int): Unit = {
    Tables.unpin()
    spark.catalog.clearCache()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { n =>
      val base = spark.read.parquet(s"$sfDir/$n.parquet")
      val p =
        if (parts == -1) {
          val bytes = new java.io.File(s"$sfDir/$n.parquet").length
          math.min(32L, math.max(1L, bytes / (1250L << 10))).toInt
        } else if (Seq("lineitem", "orders").contains(n)) parts
        else 1
      val df = (if (p > 1) base.repartition(p) else base).cache()
      df.count()
      Tables.pin((sfDir, n), df)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-part-tune")
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

    val names = SparkEntry.benchQueries
    val qmap = SparkEntry.queries
    // (cache parts for fact tables, shuffle partitions)
    val variants = Seq((8, 8), (16, 8), (16, 16), (32, 16), (32, 32), (-1, 8))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    (1 to 2).foreach { round =>
      variants.foreach { case (p, sh) =>
        repin(spark, sfDir, p)
        spark.conf.set("spark.sql.shuffle.partitions", sh.toString)
        // warmup
        (1 to 2).foreach(_ => names.foreach { n =>
          qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        })
        val samples = names.map { n =>
          n -> (1 to 5).map { _ =>
            val t0 = System.nanoTime()
            qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
        }
        val meds = samples.map { case (n, xs) => n -> median(xs) }
        val total = meds.map(_._2).sum
        println(f"TUNE round=$round parts=$p%-2d shuffle=$sh%-2d total=$total%6.3f  " +
          meds.map { case (n, m) => f"${n.split('_').head}=$m%.3f" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
