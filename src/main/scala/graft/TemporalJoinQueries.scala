package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources

/** Temporal join operators over the `events` table — the two join shapes
  * Spark has no native operator for, each built the way it survives
  * 100 TB:
  *
  *  - AS-OF join ([[asofLastError]]): attach to each fact row the most
  *    recent marker row at-or-before it. NOT implemented as a per-key
  *    lateral/subquery (O(facts·markers) probes) or a per-key
  *    `mapGroups` materialization (unbounded memory on a heavy key);
  *    instead both sides union into ONE stream, a single
  *    partition-by-key sort orders it, and a running `last(_, ignore
  *    nulls)` carries the latest marker forward — one shuffle, one
  *    sort, O(1) state per row, any key skew handled by AQE the same
  *    way any window is.
  *
  *  - RANGE (interval) join ([[rangeBurst]]): aggregate the fact rows
  *    falling in a fixed-width time window after each marker. A raw
  *    `t BETWEEN lo AND hi` join condition degenerates to
  *    BroadcastNestedLoopJoin (per-pair predicate, O(markers·facts));
  *    instead both sides are binned to window-width buckets, markers
  *    replicate to the 2 buckets their window can overlap, the join is
  *    an EQUI-join on (user, bucket) — shuffle-hash-joinable, skew-
  *    salvageable — and the exact interval predicate filters the
  *    bucket-local candidates. Candidate count ≈ bucket occupancy, not
  *    |markers|·|facts|.
  */
object TemporalJoinQueries {

  /** Marker stream: 'error' events. Facts: everything else. */
  private val MarkerType = "error"

  /** As-of join: every non-error event, annotated with the user's most
    * recent error at-or-before it (timestamp, value, and the gap). Tie
    * rules are pinned so both engines agree: a marker AT the fact's
    * exact timestamp counts ("at or before"); equal-timestamp markers
    * resolve to the highest event_id (sort is (ts, side, event_id) with
    * markers first). Timestamps travel as epoch micros (BIGINT) — no
    * engine-dependent timestamp rendering in the compared output. */
  val asofLastError: Q = Q(
    "events_asof_lastmark",
    (s, dir) => {
      val e = Sources.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
      val marks = e.filter(col("event_type") === MarkerType)
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(0).as("side"),
          unix_micros(col("ts")).as("m_ts_us"), col("value").as("m_value"))
      val facts = e.filter(col("event_type") =!= MarkerType)
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(1).as("side"),
          lit(null).cast("long").as("m_ts_us"),
          lit(null).cast("double").as("m_value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marks.unionAll(facts)
        .withColumn("last_err_us", last(col("m_ts_us"), ignoreNulls = true).over(w))
        .withColumn("last_err_value", last(col("m_value"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("last_err_us"), col("last_err_value"),
          (unix_micros(col("ts")) - col("last_err_us")).as("gap_us"))
        .orderBy("event_id")
    },
    Some(
      s"""WITH e AS (SELECT event_id, user_id, ts, event_type, value FROM events),
         |u AS (
         |  SELECT event_id, user_id, ts, 0 AS side,
         |         epoch_us(ts) AS m_ts_us, value AS m_value
         |  FROM e WHERE event_type = '$MarkerType'
         |  UNION ALL
         |  SELECT event_id, user_id, ts, 1,
         |         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
         |  FROM e WHERE event_type <> '$MarkerType'),
         |w AS (
         |  SELECT event_id, user_id, ts, side,
         |         last_value(m_ts_us IGNORE NULLS) OVER win AS last_err_us,
         |         last_value(m_value IGNORE NULLS) OVER win AS last_err_value
         |  FROM u
         |  WINDOW win AS (
         |    PARTITION BY user_id ORDER BY ts, side, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         |       last_err_us, last_err_value,
         |       epoch_us(ts) - last_err_us AS gap_us
         |FROM w WHERE side = 1
         |ORDER BY event_id""".stripMargin))

  /** Range-join window: 12 hours in micros. Bucket width equals the
    * window width, so a marker's window spans at most 2 buckets — the
    * replication factor is a constant 2 at any scale. Public: the
    * brute-force spec twin and the streaming twin must use THIS value,
    * not their own literals, or they silently stop testing the query. */
  val WindowUs: Long = 12L * 3600 * 1000000

  /** Range join: for every error event, how many fact events the same
    * user produced in the following 12 hours, and their exact value sum
    * (2-decimal source values summed in DECIMAL — accumulation-order
    * independent — and cast back to DOUBLE). Window is half-open
    * (marker_ts, marker_ts + 12h]: the marker itself never counts.
    * Markers with no followers stay in the output with 0/0.0. */
  val rangeBurst: Q = Q(
    "events_range_burst",
    (s, dir) => {
      val e = Sources.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
      val marks = e.filter(col("event_type") === MarkerType)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("m_us"))
      val facts = e.filter(col("event_type") =!= MarkerType)
        .select(col("user_id"), unix_micros(col("ts")).as("f_us"), col("value"))
        .withColumn("bucket", floor(col("f_us") / WindowUs))
      val probes = marks.withColumn("b0", floor(col("m_us") / WindowUs))
        .select(col("event_id"), col("user_id"), col("m_us"),
          explode(array(col("b0"), col("b0") + 1)).as("bucket"))
      val agg = probes.join(facts, Seq("user_id", "bucket"))
        .filter(col("f_us") > col("m_us") && col("f_us") <= col("m_us") + WindowUs)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_follow"),
          sum(col("value").cast("decimal(18,2)")).as("sum_dec"))
      marks.join(agg, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("m_us").as("ts_us"),
          coalesce(col("n_follow"), lit(0L)).as("n_follow"),
          coalesce(col("sum_dec"), lit(0).cast("decimal(18,2)"))
            .cast("double").as("sum_value"))
        .orderBy("event_id")
    },
    Some(
      s"""WITH e AS (SELECT event_id, user_id, ts, event_type, value FROM events),
         |m AS (SELECT event_id, user_id, epoch_us(ts) AS m_us
         |      FROM e WHERE event_type = '$MarkerType'),
         |f AS (SELECT user_id, epoch_us(ts) AS f_us, value
         |      FROM e WHERE event_type <> '$MarkerType'),
         |agg AS (
         |  SELECT m.event_id, count(*) AS n_follow,
         |         sum(CAST(f.value AS DECIMAL(18,2))) AS sum_dec
         |  FROM m JOIN f ON f.user_id = m.user_id
         |   AND f.f_us > m.m_us AND f.f_us <= m.m_us + $WindowUs
         |  GROUP BY m.event_id)
         |SELECT m.event_id, m.user_id, m.m_us AS ts_us,
         |       COALESCE(a.n_follow, 0) AS n_follow,
         |       CAST(COALESCE(a.sum_dec, 0) AS DOUBLE) AS sum_value
         |FROM m LEFT JOIN agg a USING (event_id)
         |ORDER BY event_id""".stripMargin))

  /** Last-write-wins state compaction (the upsert/CDC-merge shape): fold
    * the event log into its current state — one row per (user_id,
    * event_type) carrying the latest event, ties to the highest
    * event_id. Same partial-aggregating argmax as the IVF assignment
    * (`max(struct(ts, id, payload))` — map-side combine reduces each
    * partition to one row per key, so the shuffle carries keys, not the
    * log). The rank-window formulation of "latest per key" shuffles the
    * whole log; this one never does. */
  val latestState: Q = Q(
    "events_latest_state",
    (s, dir) => Sources.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("m"),
        count(lit(1)).as("n_writes"))
      .select(col("user_id"), col("event_type"),
        col("m.ts_us").as("ts_us"), col("m.event_id").as("event_id"),
        col("m.value").as("value"), col("n_writes"))
      .orderBy("user_id", "event_type"),
    Some(
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
         |  FROM events),
         |r AS (
         |  SELECT user_id, event_type, ts_us, event_id, value,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY user_id, event_type
         |           ORDER BY ts_us DESC, event_id DESC) AS rn,
         |         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_writes
         |  FROM e)
         |SELECT user_id, event_type, ts_us, event_id, value, n_writes
         |FROM r WHERE rn = 1
         |ORDER BY user_id, event_type""".stripMargin))

  def all: Seq[Q] = Seq(asofLastError, rangeBurst, latestState)
}
