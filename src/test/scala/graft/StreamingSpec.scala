package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch: the same StreamingOps plans, fed incrementally
  * through MemoryStream, must produce the batch answer. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sampleEvents: Seq[Event] = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 300).map { i =>
      Event(i.toLong, new java.sql.Timestamp(
          base + i * 7 * 60 * 1000L + (i % 3) * 1000L),
        user_id = i % 5, event_type = Seq("click", "view", "buy")(i % 3),
        value = i * 0.5)
    }
  }

  test("tumbling window counts: incremental result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      // feed in three uneven micro-batches
      val (a, rest) = sampleEvents.splitAt(100)
      val (b, c) = rest.splitAt(120)
      Seq(a, b, c).foreach { batch =>
        stream.addData(batch)
        q.processAllAvailable()
      }
      val streamed = spark.table("tumbling_out")
        .select("window_start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batchRes = StreamingOps.tumblingCounts(sampleEvents.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed === batchRes)
      assert(batchRes.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization merges state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.sessionizeStateful(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val (a, b) = sampleEvents.sortBy(_.ts.getTime).splitAt(150)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      // latest emission per user = final state
      val streamed = spark.table("sess_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
        .select(col("user_id"), col("s.n_sessions"), col("s.n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = StreamingOps.sessionizeStateful(
          sampleEvents.toDS(), gapMinutes = 30)
        .collect().map(s => (s.user_id, s.n_sessions, s.n_events)).toSet
      assert(streamed === batch)
      assert(batch.map(_._1) === (0L until 5L).toSet)
    } finally q.stop()
  }

  test("session window counts match the lag/cumsum reconstruction") {
    import spark.implicits._
    val ss = StreamingOps.sessionCounts(sampleEvents.toDF())
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(ss === 300L)
  }
}
