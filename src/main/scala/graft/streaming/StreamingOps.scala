package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream. The reference
  * has NO streaming engine (SURVEY §2.11 — its only change surface is
  * the CDC logical decoder `cdc/cdc_decoder.c`); this module is the
  * extension the north star asks for, built so every operator has a
  * batch-equivalent query the DuckDB oracle can check (StreamingSpec
  * additionally proves stream-vs-batch agreement through MemoryStream).
  *
  * Scale: tumbling/session aggregation state is keyed by (window, type)
  * or user — state store partitions by key, watermark bounds state
  * growth; at 100 TB/day the same topology holds with kafka sources and
  * more shuffle partitions.
  */
object StreamingOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_sessions: Long,
      n_events: Long)

  /** Tumbling 1-hour counts per event type; `withWatermark` only binds
    * on a streaming source (no-op columns-wise in batch). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Native session windows (30-minute gap). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * KeyValueGroupedDataset path for state machines the built-in
    * windows can't express. Emits one summary per user on timeout/end. */
  def sessionizeStateful(events: Dataset[Event], gapMinutes: Int)
      : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        // state: (lastTs, nSessions, nEvents)
        (user: Long, rows: Iterator[Event],
            state: GroupState[(Long, Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var (lastTs, nSessions, nEvents) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            if (lastTs == Long.MinValue || e.ts.getTime - lastTs > gapMs)
              nSessions += 1
            nEvents += 1
            lastTs = e.ts.getTime
          }
          state.update((lastTs, nSessions, nEvents))
          Iterator(SessionSummary(user, nSessions, nEvents))
      }
  }
}
