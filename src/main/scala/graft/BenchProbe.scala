package graft

import org.apache.spark.sql.SparkSession

/** One-off probe: split warm bench-query time into Catalyst
  * analyze+optimize+plan vs. execution, to see what dominates at sf0.1.
  * Also checks WITH RECURSIVE support. Not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bench-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // recursive CTE support?
    try {
      val n = spark.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT * FROM t").count()
      println(s"PROBE recursive_cte OK rows=$n")
    } catch {
      case e: Throwable =>
        println(s"PROBE recursive_cte FAIL ${e.getClass.getName}: ${e.getMessage.take(200)}")
    }

    val qmap = SparkEntry.queries
    Tables.pinForBench(spark, sfDir)
    val names = SparkEntry.benchQueries
    // warm up
    (1 to 2).foreach(_ => names.foreach { n =>
      qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    })
    names.foreach { n =>
      // planning: build DF and force the executed plan (no jobs run
      // until AQE materializes stages, which happens on execute)
      val t0 = System.nanoTime()
      val df = qmap(n)(spark, sfDir)
      val _ = df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"PROBE $n%-28s plan=${(t1 - t0) / 1e3}%8.0f us  write=${(t2 - t1) / 1e3}%8.0f us")
    }
    spark.stop()
  }
}
