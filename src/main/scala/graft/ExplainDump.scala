package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plan summaries for the headline queries. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qmap = SparkEntry.queries
    SparkEntry.benchQueries.foreach { n =>
      val df = qmap(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = graft.plans.PlanChecks.executedPlan(df)
      val shuffles = plan.toString.split("\n").count(_.contains("Exchange"))
      val kinds = plan.collect { case p => p.nodeName }.groupBy(identity)
        .map { case (k, v) => s"$k x${v.size}" }.toSeq.sorted
      println(s"PLAN $n :: " + kinds.filter(k =>
        k.contains("Join") || k.contains("Exchange") || k.contains("Aggregate")
          || k.contains("Scan") || k.contains("TakeOrdered") || k.contains("Sort"))
        .mkString(", "))
    }
    spark.stop()
  }
}
