package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round 13, not part of the driver contract): write the
  * `.explain("formatted")` output of named queries into plan files for
  * the optimization record (`plans/r13/<query>_<tag>.txt`). Runs under
  * the SAME session config as Bench (data-proportional shuffle
  * partitions / AQE / split sizing) so the captured plan is the one the
  * bench actually times.
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=before SPARK_GRAFT_BENCH_QUERIES=a,b \
  *          sbt "runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "after")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r13")
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.getName.endsWith(".parquet")).map(_.length).sum)
      .getOrElse(0L)
    val shufParts = math.max(1L,
      math.min(cpus.toLong * 4, inputBytes / (64L << 20)))
    val aqe = shufParts >= 8
    val partBytes = math.max(16L << 20,
      math.min(128L << 20, inputBytes / (cpus.toLong * 2)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.files.maxPartitionBytes", partBytes.toString)
      .config("spark.sql.shuffle.partitions", shufParts.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe.toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.pinForBench(spark, sfDir)
    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.benchQueries)
    val qmap = SparkEntry.queries
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = qmap(n)(spark, sfDir)
      // run it so the post-AQE executed plan is final, then capture both
      // the formatted (pre-execution) plan and the executed tree.
      df.write.format("noop").mode("overwrite").save()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = graft.plans.PlanChecks.executedPlan(df).toString
      val body = s"== $n ($tag) ==\n\n" + formatted +
        "\n\n== executed plan (post-AQE) ==\n\n" + executed + "\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        body.getBytes("UTF-8"))
      println(s"WROTE $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
