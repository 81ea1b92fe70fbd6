package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Event-stream analytics in batch form — the same plans StreamingOps
  * runs incrementally (StreamingSpec proves stream≡batch), here driven
  * through the DuckDB oracle. events.ts is normalized to a microsecond
  * TimestampType at the load point (Tables.readEvents), whatever the
  * parquet generation shipped.
  */
object EventQueries extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Tumbling window aggregation (streaming: tumblingCounts). */
  private val tumbling = GraftQuery(
    "events_tumbling_window",
    (s, dir) =>
      StreamingOps.tumblingCounts(ev(s, dir))
        .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
      COUNT(*) AS n_events
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Windowed approximate distinct users over HLL sketches (streaming:
    * tumblingApproxUsers — per-window state is one fixed-size sketch,
    * not a user set). Oracled with the bounded-error verdict pattern:
    * exact distinct count + a tolerance boolean, both deterministic. */
  private val windowApproxUsers = GraftQuery(
    "events_window_approx_users",
    (s, dir) => {
      val e = ev(s, dir)
      val approx = StreamingOps.tumblingApproxUsers(e)
      val exact = e
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .select(col("w.start").as("window_start"), col("exact_users"))
      approx.join(exact, "window_start")
        .select(col("window_start"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.05 + 1.0).as("estimate_ok"))
        .orderBy(col("window_start"))
    },
    Some("""SELECT date_trunc('hour', ts) AS window_start,
      COUNT(DISTINCT user_id) AS exact_users, TRUE AS estimate_ok
      FROM events GROUP BY 1 ORDER BY window_start"""))

  /** Sliding 1-hour/15-minute windows (streaming: slidingCounts);
    * oracle expands each event into its 4 covering epoch-aligned
    * windows — the same alignment Spark's window() uses. */
  private val sliding = GraftQuery(
    "events_sliding_window",
    (s, dir) =>
      StreamingOps.slidingCounts(ev(s, dir))
        .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT CAST(time_bucket(INTERVAL '15 minutes', ts)
          - k * INTERVAL '15 minutes' AS TIMESTAMP) AS window_start,
        event_type, COUNT(*) AS n_events
      FROM events, range(4) t(k)
      GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Session windows by 30-min inactivity gap (streaming:
    * sessionCounts); oracle reconstructs sessions with lag+cumsum. */
  private val sessions = GraftQuery(
    "events_session_window",
    (s, dir) =>
      StreamingOps.sessionCounts(ev(s, dir))
        .orderBy(col("user_id"), col("session_start")),
    Some("""WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events),
      numbered AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM marked)
      SELECT user_id,
        CAST(date_trunc('microseconds', MIN(ts)) AS TIMESTAMP)
          AS session_start,
        COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, sess
      ORDER BY user_id, session_start"""))

  /** Per-user session summaries via the stateful path
    * (flatMapGroupsWithState in batch mode — same state machine the
    * stream runs). */
  private val sessionize = GraftQuery(
    "events_sessionize_stateful",
    (s, dir) => {
      import s.implicits._
      val events = ev(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[StreamingOps.Event]
      StreamingOps.sessionizeStateful(events, gapMinutes = 30)
        .toDF()
        .orderBy(col("user_id"))
    },
    Some("""WITH marked AS (
        SELECT user_id,
          CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events)
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        COUNT(*) AS n_events
      FROM marked GROUP BY user_id ORDER BY user_id"""))

  /** Event funnel: users who clicked then purchased within 1 hour
    * (self-join on user with a time-range predicate — the as-of family). */
  private val funnel = GraftQuery(
    "events_funnel_click_purchase",
    (s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("click_ts"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("bu"), col("ts").as("buy_ts"))
      clicks.join(buys, col("cu") === col("bu") &&
          col("buy_ts") > col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("cu").as("user_id"))
        .agg(count(lit(1)).as("n_conversions"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT c.user_id AS user_id, COUNT(*) AS n_conversions
      FROM (SELECT user_id, ts FROM events WHERE event_type='click') c
      JOIN (SELECT user_id, ts FROM events WHERE event_type='purchase') p
        ON c.user_id = p.user_id AND p.ts > c.ts
        AND p.ts <= c.ts + INTERVAL 1 HOUR
      GROUP BY c.user_id ORDER BY user_id"""))

  /** As-of join: each click matched to the latest purchase at-or-before
    * it (union + conditional last_value — one shuffle by user, no range
    * join explosion; DuckDB's native ASOF JOIN is the oracle). */
  private val asof = GraftQuery(
    "events_asof_join",
    (s, dir) => {
      val e = ev(s, dir)
      // the generic operator (operators/AsOfJoin): union + tagged
      // ordering + running last_value — one key shuffle, no range join
      graft.operators.AsOfJoin.asofBackward(
          left = e.filter(col("event_type") === "click")
            .select(col("event_id"), col("user_id"), col("ts")),
          right = e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts")),
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          pick = Seq("ts"))
        .select(col("event_id"), col("user_id"),
          col("asof_ts").as("last_purchase_ts"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT c.event_id, c.user_id,
        CAST(date_trunc('microseconds', p.ts) AS TIMESTAMP)
          AS last_purchase_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts <= c.ts
      ORDER BY c.event_id"""))

  /** Retention cohorts: users grouped by first-seen week, counted in
    * each later week they return — the standard product-analytics
    * triangle. Two shuffles total (first-seen agg on user_id, cohort
    * roll-up), both on bounded keys; at 100 TB the distinct-activity
    * stage pre-aggregates map-side because (user_id, week) repeats
    * within partitions. */
  private val retention = GraftQuery(
    "events_retention_cohort",
    (s, dir) => {
      val activity = ev(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val cohorts = activity.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_week"))
      // r13 (guide §2.4): count(*) here IS countDistinct(user_id) —
      // `activity` is distinct on (user_id, wk), cohort_week is
      // functionally dependent on user_id, and wk ↦ week_offset is
      // injective per user, so a user contributes at most one row per
      // (cohort_week, week_offset) group. Dropping the distinct
      // removes the Expand/dedup layer from the final aggregate;
      // provably identical results.
      activity.join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events),
      cohorts AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM activity GROUP BY 1)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
        COUNT(DISTINCT a.user_id) AS n_users
      FROM activity a JOIN cohorts c ON a.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""))

  /** Interval-containment join via the binned RangeJoin operator:
    * events landing inside 3-day promo windows (one window per week).
    * A bare BETWEEN join would plan as BroadcastNestedLoopJoin —
    * quadratic at scale; RangeJoin buckets time by day, replicates
    * each interval into its ≤4 covering buckets, and meets points in
    * ONE hash shuffle with containment as a residual filter. The
    * oracle runs the genuine non-equi join in DuckDB, proving the
    * rewrite loses and invents nothing. */
  private val intervalJoin = GraftQuery(
    "events_interval_join",
    (s, dir) => {
      val e = ev(s, dir)
      val iv = e.select(date_trunc("week", col("ts")).as("wstart")).distinct()
        .select(col("wstart"),
          (col("wstart") + expr("INTERVAL 3 DAYS")).as("wend"))
      graft.operators.RangeJoin
        .pointInInterval(e, iv, "ts", "wstart", "wend", 86400L)
        .groupBy(col("wstart").cast(DateType).as("promo_start"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("promo_start"))
    },
    Some("""WITH iv AS (
        SELECT DISTINCT date_trunc('week', ts) AS wstart FROM events)
      SELECT CAST(iv.wstart AS DATE) AS promo_start,
        COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      FROM events e JOIN iv
        ON e.ts >= iv.wstart AND e.ts < iv.wstart + INTERVAL 3 DAY
      GROUP BY 1 ORDER BY 1"""))

  /** Ordered multi-step funnel (view → click → purchase, each step
    * strictly after the previous one's FIRST occurrence): the product
    * analytics staple. Three grouped mins chained through two
    * broadcast-friendly per-user joins — every stage distributes by
    * user_id, no window over the whole event stream, so the shuffle
    * key is stable across stages (one co-partitioned lineage at
    * scale). */
  private val funnelSteps = GraftQuery(
    "events_funnel_steps",
    (s, dir) => {
      val e = ev(s, dir)
      def firstOf(tpe: String) = e.filter(col("event_type") === tpe)
        .groupBy(col("user_id")).agg(min(col("ts")).as(s"ts_$tpe"))
      val s1 = firstOf("view")
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts") > col("ts_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts_click"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("ts_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts_purchase"))
      val n1 = s1.agg(count(lit(1)).as("n_viewed"))
      val n2 = s2.agg(count(lit(1)).as("n_clicked_after_view"))
      val n3 = s3.agg(count(lit(1)).as("n_purchased_after_click"))
      n1.crossJoin(n2).crossJoin(n3)
    },
    Some("""WITH s1 AS (SELECT user_id, MIN(ts) AS ts_view FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) AS ts_click FROM events e
          JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ts_view
          WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.ts) AS ts_purchase FROM events e
          JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.ts_click
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT (SELECT COUNT(*) FROM s1) AS n_viewed,
        (SELECT COUNT(*) FROM s2) AS n_clicked_after_view,
        (SELECT COUNT(*) FROM s3) AS n_purchased_after_click"""))

  override val queries: Seq[GraftQuery] =
    Seq(tumbling, windowApproxUsers, sliding, sessions, sessionize, funnel,
      asof, retention, intervalJoin, funnelSteps)
}
