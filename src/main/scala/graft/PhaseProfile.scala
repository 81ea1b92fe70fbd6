package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool (round 13, not part of the driver contract): per-query phase
  * breakdown for the headline bench set — how much of each timed pass is
  * Catalyst front-end work (analysis / optimization / physical planning)
  * vs actual execution. Uses the same session config as Bench so the
  * numbers map 1:1 onto the bench medians (guide §1: measure first).
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      .appName("graft-phase-profile")
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

    // Collect per-execution phase durations from the planning tracker.
    val phases = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Long]]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        val m = qe.tracker.phases.map { case (k, v) =>
          k -> (v.endTimeMs - v.startTimeMs)
        }.toMap + ("TOTAL_MS" -> durationNs / 1000000)
        phases.add(m)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })

    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.benchQueries)
    val qmap = SparkEntry.queries
    Tables.pinForBench(spark, sfDir)
    if (sys.env.contains("SPARK_GRAFT_BENCH_QUERIES"))
      Seq("documents", "embeddings", "events").foreach { n =>
        val df = Tables(spark, sfDir, n).cache(); df.count()
        Tables.pin((sfDir, n), df)
      }
    val warmups = sys.env.get("SPARK_GRAFT_WARMUPS")
      .flatMap(_.toIntOption).getOrElse(4)
    (1 to warmups).foreach { _ =>
      names.foreach { n =>
        try qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(_.toIntOption).getOrElse(5)
    names.foreach { n =>
      val samples = (1 to passes).map { _ =>
        phases.clear()
        val t0 = System.nanoTime()
        qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e6
        // the noop save produces exactly one tracked execution
        val p = Option(phases.poll()).getOrElse(Map.empty[String, Long])
        (wall, p)
      }
      // median by wall time
      val sorted = samples.sortBy(_._1)
      val (wall, p) = sorted(sorted.size / 2)
      val keys = Seq("analysis", "optimization", "planning")
      val front = keys.map(k => p.getOrElse(k, 0L)).sum
      println(f"PHASE $n%-28s wall=$wall%7.1f ms  front=$front%4d ms (" +
        keys.map(k => s"$k=${p.getOrElse(k, 0L)}").mkString(" ") +
        f") exec=${wall - front}%7.1f ms  [min=${sorted.head._1}%6.1f max=${sorted.last._1}%6.1f]")
    }
    spark.stop()
  }
}
