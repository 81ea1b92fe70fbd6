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

  test("streaming corpus intake: normalize -> quality gate -> dedup " +
      "with bounded state; cross-batch replays drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def doc(id: Long, minute: Int, text: String) =
      (id, new java.sql.Timestamp(base + minute * 60000L), text)
    val batch1 = Seq(
      doc(1, 0, "The  quick brown fox jumps over the lazy dog"),
      doc(2, 1, "THE QUICK BROWN  FOX jumps over the lazy dog"), // dup of 1
      doc(3, 2, "short"), // fails the quality gate
      doc(4, 3, "a completely different document body right here"))
    val batch2 = Seq(
      doc(5, 10, "the quick brown fox jumps over the lazy dog"), // replay
      doc(6, 11, "yet another novel document with enough length"))
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.docIntake(
        stream.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("intake_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      val kept = spark.table("intake_out").collect()
        .map(r => r.getLong(0)).toSet
      // 2 dups of 1 (same batch), 5 replays it (later batch, inside the
      // watermark), 3 too short -> 1, 4, 6 survive
      assert(kept === Set(1L, 4L, 6L), s"got $kept")
      // batch semantics agree on the surviving hash set
      // (dropDuplicatesWithinWatermark is streaming-only; the batch
      // reference is plain normalize -> gate -> distinct hash)
      val batchHashes = (batch1 ++ batch2).toDF("doc_id", "ts", "text")
        .withColumn("norm",
          lower(regexp_replace(col("text"), "\\s+", " ")))
        .filter(length(col("norm")) >= 20)
        .select(md5(col("norm")).as("content_hash")).distinct()
        .collect().map(_.getString(0)).toSet
      val streamHashes = spark.table("intake_out").collect()
        .map(_.getString(2)).toSet
      assert(streamHashes === batchHashes)
    } finally q.stop()
  }

  test("stream-static dimension enrich: broadcast join per micro-batch " +
      "equals the batch join (REFERENCE_JOIN, streaming form)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "seg_a"), (1L, "seg_b"), (2L, "seg_c"),
      (3L, "seg_d"), (4L, "seg_e")).toDF("seg_id", "seg_name")
    val stream = MemoryStream[Event]
    val q = StreamingOps.dimensionEnrich(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      val (a, b) = sampleEvents.splitAt(140)
      Seq(a, b).foreach { batch =>
        stream.addData(batch); q.processAllAvailable()
      }
      val streamed = spark.table("enrich_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batchRes = StreamingOps
        .dimensionEnrich(sampleEvents.toDF(), dim).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed === batchRes && batchRes.nonEmpty)
      // the plan keeps the dimension on the broadcast side
      assert(graft.plans.PlanChecks.hasBroadcastHashJoin(
        StreamingOps.dimensionEnrich(sampleEvents.toDF(), dim)))
    } finally q.stop()
  }

  test("windowed HLL approx-distinct: incremental sketch state equals " +
      "the batch estimate exactly (register-max merge is order-free)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.tumblingApproxUsers(stream.toDF())
      .writeStream.format("memory").queryName("approx_users_out")
      .outputMode("complete").start()
    try {
      val (a, b) = sampleEvents.splitAt(150)
      Seq(a, b).foreach { batch =>
        stream.addData(batch)
        q.processAllAvailable()
      }
      val streamed = spark.table("approx_users_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      val batchRes = StreamingOps.tumblingApproxUsers(sampleEvents.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      assert(streamed === batchRes,
        "sketch merge must be order/batching independent")
      assert(batchRes.nonEmpty)
    } finally q.stop()
  }

  test("append-mode tumbling agg drops data later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600 * 1000L
    val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
    def at(ms: Long, id: Long) =
      Event(id, new java.sql.Timestamp(ms), 1L, "click", 1.0)
    val onTime = Seq(at(base + 10 * 60 * 1000L, 1), at(base + 20 * 60 * 1000L, 2))
    val advance = Seq(at(base + 10 * h, 3)) // watermark → t+8h, well past hour 0
    val late = Seq(at(base + 30 * 60 * 1000L, 4)) // hour-0 event, arrives too late
    val stream = MemoryStream[Event]
    val q = StreamingOps.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("late_drop_out")
      .outputMode("append").start()
    try {
      stream.addData(onTime); q.processAllAvailable()
      stream.addData(advance); q.processAllAvailable()
      stream.addData(late); q.processAllAvailable()
      // one more watermark bump so every finalized window is emitted
      stream.addData(Seq(at(base + 20 * h, 5))); q.processAllAvailable()
      val hour0 = new java.sql.Timestamp(base)
      val streamed = spark.table("late_drop_out")
        .filter(col("window_start") === hour0)
        .select("n_events").collect().map(_.getLong(0))
      // the late event was DROPPED: hour 0 closed at 2 events
      assert(streamed.toSeq === Seq(2))
      // batch over the same data (no arrival order) counts all 3
      val batchHour0 = StreamingOps.tumblingCounts(
          (onTime ++ advance ++ late).toDF())
        .filter(col("window_start") === hour0)
        .collect().map(_.getLong(2))
      assert(batchHour0.toSeq === Seq(3))
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

  test("sliding window counts: incremental result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.slidingCounts(stream.toDF())
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try {
      val (a, b) = sampleEvents.splitAt(140)
      Seq(a, b).foreach { batch =>
        stream.addData(batch); q.processAllAvailable()
      }
      val streamed = spark.table("sliding_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batchRes = StreamingOps.slidingCounts(sampleEvents.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed === batchRes)
      // every event lands in exactly 4 overlapping windows
      assert(batchRes.toSeq.map(_._3).sum === 4L * sampleEvents.size)
    } finally q.stop()
  }

  test("streaming dedup drops cross-batch replays within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamingOps.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val (a, b) = sampleEvents.splitAt(200)
      stream.addData(a ++ a.take(50)) // in-batch duplicates
      q.processAllAvailable()
      stream.addData(b ++ a.slice(150, 200)) // cross-batch replays
      q.processAllAvailable()
      val streamed = spark.table("dedup_out").count()
      val batch = StreamingOps.dedupEvents(
        (sampleEvents ++ sampleEvents.take(50)).toDF()).count()
      assert(streamed === batch)
      assert(batch === 300L)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = sampleEvents.filter(_.event_type == "click")
    val buys = sampleEvents.filter(_.event_type == "buy")
    val cs = MemoryStream[Event]
    val ps = MemoryStream[Event]
    val q = StreamingOps.clickPurchaseJoin(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = clicks.splitAt(40)
      val (p1, p2) = buys.splitAt(60)
      cs.addData(c1); ps.addData(p1); q.processAllAvailable()
      cs.addData(c2); ps.addData(p2); q.processAllAvailable()
      val streamed = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
        .toSet
      val batch = StreamingOps.clickPurchaseJoin(
          clicks.toDF(), buys.toDF()).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
        .toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join null-extends unmatched clicks " +
      "after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = sampleEvents.filter(_.event_type == "click")
    val buys = sampleEvents.filter(_.event_type == "buy")
    // sentinel far past the data pushes both watermarks beyond every
    // click's join window so the null-extended rows are emitted
    val maxTs = sampleEvents.map(_.ts.getTime).max
    val sentinel = Event(-1L,
      new java.sql.Timestamp(maxTs + 12 * 3600 * 1000L), -1L, "noop", 0.0)
    val cs = MemoryStream[Event]
    val ps = MemoryStream[Event]
    val q = StreamingOps.clickPurchaseLeftJoin(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("ssj_left_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = clicks.splitAt(40)
      val (p1, p2) = buys.splitAt(60)
      cs.addData(c1); ps.addData(p1); q.processAllAvailable()
      cs.addData(c2); ps.addData(p2); q.processAllAvailable()
      cs.addData(Seq(sentinel)); ps.addData(Seq(sentinel))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)))
      val streamed = spark.table("ssj_left_out").collect()
        .filter(_.getLong(0) >= 0).map(key).toSet
      val batch = StreamingOps.clickPurchaseLeftJoin(
          clicks.toDF(), buys.toDF()).collect().map(key).toSet
      assert(streamed === batch)
      // the outer semantics actually fired: some clicks are unmatched
      assert(batch.exists(_._3.isEmpty) && batch.exists(_._3.nonEmpty))
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join null-extends both sides after " +
      "watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = sampleEvents.filter(_.event_type == "click")
    val buys = sampleEvents.filter(_.event_type == "buy")
    val maxTs = sampleEvents.map(_.ts.getTime).max
    val sentinel = Event(-1L,
      new java.sql.Timestamp(maxTs + 12 * 3600 * 1000L), -1L, "noop", 0.0)
    val cs = MemoryStream[Event]
    val ps = MemoryStream[Event]
    val q = StreamingOps.clickPurchaseFullJoin(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("ssj_full_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = clicks.splitAt(40)
      val (p1, p2) = buys.splitAt(60)
      cs.addData(c1); ps.addData(p1); q.processAllAvailable()
      cs.addData(c2); ps.addData(p2); q.processAllAvailable()
      cs.addData(Seq(sentinel)); ps.addData(Seq(sentinel))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), Option(r.getTimestamp(1)), Option(r.getTimestamp(2)))
      val streamed = spark.table("ssj_full_out").collect()
        .filter(_.getLong(0) >= 0).map(key).toSet
      val batch = StreamingOps.clickPurchaseFullJoin(
          clicks.toDF(), buys.toDF()).collect().map(key).toSet
      assert(streamed === batch)
      // both outer sides actually fired: unmatched clicks (no purchase)
      // and unmatched purchases (no preceding click)
      assert(batch.exists(r => r._2.nonEmpty && r._3.isEmpty))
      assert(batch.exists(r => r._2.isEmpty && r._3.nonEmpty))
      assert(batch.exists(r => r._2.nonEmpty && r._3.nonEmpty))
    } finally q.stop()
  }

  test("CDC materialization: streamed change log equals batch snapshot") {
    import spark.implicits._
    import graft.streaming.StreamingOps.Change
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // interleaved inserts/updates/deletes over 40 keys, unique ts per key
    val changes = (0 until 400).map { i =>
      Change(key = i % 40,
        op = Seq("I", "U", "D", "U", "U")((i / 40 + i % 40) % 5),
        payload = i * 1.5,
        ts = new java.sql.Timestamp(base + i * 1000L))
    }
    val stream = MemoryStream[Change]
    val q = StreamingOps.cdcMaterialize(stream.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      val (a, b) = changes.splitAt(170)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      // last emission per key = materialized state
      val streamed = spark.table("cdc_out")
        .groupBy("key")
        .agg(max(struct(col("payload"), col("deleted"))).as("s"))
        .select(col("key"), col("s.payload"), col("s.deleted"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
        .toSet
      val batch = StreamingOps.cdcSnapshot(changes.toDF())
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
        .toSet
      assert(streamed === batch)
      assert(batch.size === 40)
      assert(batch.exists(_._3)) // some keys end deleted
    } finally q.stop()
  }

  test("session window counts match the lag/cumsum reconstruction") {
    import spark.implicits._
    val ss = StreamingOps.sessionCounts(sampleEvents.toDF())
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(ss === 300L)
  }
}
