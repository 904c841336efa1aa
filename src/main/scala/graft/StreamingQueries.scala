package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources
import graft.streaming.EventStream

/** Batch-checkable faces of the streaming transformations: the SAME
  * functions that run over readStream (streaming/EventStream.scala) are
  * applied to the batch events table here, so the DuckDB oracle verifies
  * the transformation logic; the streaming execution path is exercised
  * by the streaming spec. */
object StreamingQueries {

  /** Tumbling 1h window per event type (watermarked in stream mode). */
  val windowedCounts: Q = Q(
    "stream_windowed_counts",
    (s, dir) => EventStream.windowedCounts(Sources.events(s, dir))
      .orderBy("window_start", "event_type"),
    Some(
      """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin))

  /** Per-user gap sessionization (batch: lag + running-sum window —
    * spillable, no per-user materialization; the streaming twin keeps
    * the open session in GroupState via flatMapGroupsWithState). */
  val sessions: Q = Q(
    "stream_sessionization",
    (s, dir) => {
      import s.implicits._
      EventStream.sessionsBatch(
        Sources.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
          .as[EventStream.SessionEvent])
        .toDF()
        .orderBy("user_id", "session_start_us")
    },
    Some(
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |o AS (SELECT user_id, ts_us,
         |             lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
         |      FROM e),
         |f AS (SELECT user_id, ts_us,
         |             CASE WHEN prev IS NULL OR ts_us - prev > ${EventStream.SessionGapUs} THEN 1 ELSE 0 END AS brk
         |      FROM o),
         |g AS (SELECT user_id, ts_us,
         |             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM f)
         |SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
         |       count(*) AS n_events
         |FROM g GROUP BY user_id, sid
         |ORDER BY user_id, session_start_us""".stripMargin))

  /** The same sessionization through Spark's NATIVE session_window
    * operator — the "compose built-ins first" rung of the ladder
    * (built-in gap-merge > window formulation > custom state), shared
    * by the query and the boundary-pinning spec. Point events merge iff
    * ts − prev ≤ gap: session_window's merge test is inclusive
    * (next.start ≤ current.end with end = ts + gap), so two events
    * EXACTLY gap apart land in one session — adjudicated empirically by
    * Round9OpsSpec's planted exactly-gap case, which is why every LAG
    * twin here breaks on strict `>` (a `>=` formulation would split at
    * the boundary and diverge from the native operator). Start/end are
    * re-derived as min/max event times because session_window.end adds
    * the gap. Works identically under readStream + watermark. Shares
    * stream_sessionization's oracle — three formulations, one
    * contract. */
  def sessionWindowSessions(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.groupBy(col("user_id"),
        session_window(col("ts"), s"${EventStream.SessionGapUs} microseconds"))
      .agg(
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))

  val sessionsNative: Q = Q(
    "stream_session_window",
    (s, dir) => sessionWindowSessions(Sources.events(s, dir))
      .orderBy("user_id", "session_start_us"),
    sessions.oracle)

  /** Watermarked ingest dedup over a feed with planted duplicate
    * deliveries (event_id%5 arrives twice). */
  val dedupIngest: Q = Q(
    "stream_dedup_ingest",
    (s, dir) => {
      val e = Sources.events(s, dir)
      val withDups = e.unionAll(e.filter(col("event_id") % 5 === 0))
      EventStream.dedupedIngest(withDups)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        .orderBy("event_id")
    },
    Some(
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
        |u AS (SELECT * FROM e UNION ALL SELECT * FROM e WHERE event_id % 5 = 0)
        |SELECT DISTINCT event_id, ts_us, event_type, value FROM u
        |ORDER BY event_id""".stripMargin))

  /** Windowed trending top-k: per 6-hour tumbling window, the 2 most
    * frequent event types — the live-dashboard "trending" shape. Two
    * aggregates share the window key (counts then rank-within-window);
    * the rank window sees one row per (window, type), never the events.
    * Under readStream this is windowedCounts + the same rank in a
    * foreachBatch/complete sink; the batch face is what the oracle can
    * gate. Fully tie-broken (count DESC, type ASC). */
  val trending: Q = Q(
    "stream_trending",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("window_start"))
        .orderBy(desc("n"), col("event_type"))
      Sources.events(s, dir)
        .groupBy(
          window(col("ts"), "6 hours").getField("start").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n"), col("rk"))
        .orderBy("window_start", "rk")
    },
    Some(
      """WITH c AS (
        |  SELECT strftime(time_bucket(INTERVAL 6 HOUR, ts), '%Y-%m-%d %H:%M:%S')
        |           AS window_start,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT window_start, event_type, n,
        |         row_number() OVER (PARTITION BY window_start
        |                            ORDER BY n DESC, event_type) AS rk
        |  FROM c)
        |SELECT window_start, event_type, n, rk
        |FROM r WHERE rk <= 2
        |ORDER BY window_start, rk""".stripMargin))

  /** Session entry/exit analysis: per gap-session, the FIRST and LAST
    * event types plus duration — the "landing/exit page" shape of
    * product analytics. Session ids come from the same lag+running-sum
    * break logic as [[sessions]] (one per-user sorted window); entry
    * and exit are min/max-of-struct argmaxes over (ts, event_id) — the
    * partial-aggregating pattern, never a per-session sort or collect.
    * Tie rule pinned by event_id inside the struct. */
  val sessionEntryExit: Q = Q(
    "stream_session_entry_exit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val run = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Sources.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .withColumn("brk",
          when(lag(col("ts_us"), 1).over(byUser).isNull ||
            col("ts_us") - lag(col("ts_us"), 1).over(byUser) >
              EventStream.SessionGapUs, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(run))
        .groupBy(col("user_id"), col("sid"))
        .agg(
          min(struct(col("ts_us"), col("event_id"), col("event_type"))).as("en"),
          max(struct(col("ts_us"), col("event_id"), col("event_type"))).as("ex"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sid"),
          col("en.ts_us").as("session_start_us"),
          col("en.event_type").as("entry_type"),
          col("ex.event_type").as("exit_type"),
          (col("ex.ts_us") - col("en.ts_us")).as("duration_us"),
          col("n_events"))
        .orderBy("user_id", "sid")
    },
    Some(
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
         |  FROM events),
         |o AS (
         |  SELECT user_id, event_id, ts_us, event_type,
         |         CASE WHEN lag(ts_us) OVER w IS NULL
         |                OR ts_us - lag(ts_us) OVER w > ${EventStream.SessionGapUs}
         |              THEN 1 ELSE 0 END AS brk
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |g AS (
         |  SELECT user_id, event_id, ts_us, event_type,
         |         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM o),
         |r AS (
         |  SELECT user_id, sid, ts_us, event_type,
         |         row_number() OVER (PARTITION BY user_id, sid
         |                            ORDER BY ts_us, event_id) AS rn_a,
         |         row_number() OVER (PARTITION BY user_id, sid
         |                            ORDER BY ts_us DESC, event_id DESC) AS rn_d,
         |         count(*) OVER (PARTITION BY user_id, sid) AS n_events,
         |         min(ts_us) OVER (PARTITION BY user_id, sid) AS session_start_us,
         |         max(ts_us) OVER (PARTITION BY user_id, sid) AS session_end_us
         |  FROM g)
         |SELECT user_id, sid, session_start_us,
         |       min(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
         |       min(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
         |       max(session_end_us) - max(session_start_us) AS duration_us,
         |       max(n_events) AS n_events
         |FROM r
         |GROUP BY user_id, sid, session_start_us
         |ORDER BY user_id, sid""".stripMargin))

  /** Windowed unique-user counts: distinct users per 6-hour window, as
    * a TWO-LEVEL aggregate — (window, user) pre-aggregate with map-side
    * combine, then a count per window. A direct windowed
    * countDistinct(user) plans an Expand over every event (the
    * dq_profile lesson on a windowed shape); this form's shuffle
    * carries one row per (window, user) pair. Streaming twin: the same
    * two-level shape under a watermark, or approx_count_distinct for
    * mergeable state (oracle would drop to rows-only — HLLs aren't
    * bit-compatible across engines; exact here so the gate holds). */
  val windowUniqueUsers: Q = Q(
    "stream_window_unique_users",
    (s, dir) => Sources.events(s, dir)
      .groupBy(
        window(col("ts"), "6 hours").getField("start").as("window_start"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window_start"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n")).as("n_events"))
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("n_users"), col("n_events"))
      .orderBy("window_start"),
    Some(
      """WITH p AS (
        |  SELECT strftime(time_bucket(INTERVAL 6 HOUR, ts), '%Y-%m-%d %H:%M:%S')
        |           AS window_start,
        |         user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, count(*) AS n_users,
        |       CAST(SUM(n) AS BIGINT) AS n_events
        |FROM p
        |GROUP BY window_start
        |ORDER BY window_start""".stripMargin))

  def all: Seq[Q] = Seq(windowedCounts, sessions, sessionsNative, dedupIngest,
    trending, sessionEntryExit, windowUniqueUsers)
}
