package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (round 13, not part of the driver contract): stage-level
  * metrics for a bench query — per stage: wall time, summed task run
  * time, task count, shuffle bytes — so the sub-second bench entries can
  * be attributed to compute vs scheduling vs exchange (guide §1/§7).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES",
      "join_shuffle_fact").split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-profile")
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

    case class StageRec(id: Int, name: String, tasks: Int, wallMs: Long,
        taskMs: Long, shufReadB: Long, shufWriteB: Long, inRows: Long,
        outRows: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(StageRec(si.stageId, si.name.split("\n").head.take(60),
          si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten))
      }
    })

    Tables.pinForBench(spark, sfDir)
    Seq("documents", "embeddings", "events").foreach { n =>
      val df = Tables(spark, sfDir, n).cache(); df.count()
      Tables.pin((sfDir, n), df)
    }
    val qmap = SparkEntry.queries
    (1 to 4).foreach(_ => names.foreach { n =>
      try qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    })
    names.foreach { n =>
      stages.clear()
      val t0 = System.nanoTime()
      qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e6
      println(f"\nQUERY $n wall=$wall%8.1f ms")
      import scala.jdk.CollectionConverters._
      val recs = stages.asScala.toSeq.sortBy(_.id)
      recs.foreach { r =>
        println(f"  stage ${r.id}%3d tasks=${r.tasks}%3d wall=${r.wallMs}%5d ms taskSum=${r.taskMs}%5d ms " +
          f"shufR=${r.shufReadB / 1024}%7d KB shufW=${r.shufWriteB / 1024}%7d KB " +
          f"shufWrows=${r.outRows}%8d  ${r.name}")
      }
      val stageWall = recs.map(_.wallMs).sum
      println(f"  stages wall-sum=$stageWall%5d ms  (query wall $wall%8.1f ms; gap=${wall - stageWall}%8.1f ms)")
    }
    spark.stop()
  }
}
