package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table

/** Documented downstream analysis queries (SURVEY.md §2.6-§2.7) plus the
  * core relational surface, each oracle-checked vs DuckDB.
  *
  * Double aggregation goes through exact DECIMAL sums (order-independent)
  * and back to DOUBLE — see Registry's parity rules.
  */
object AnalysisQueries {

  /** A4 — grouped trend aggregation (Pending Orders PDF §7). */
  val trendByMonth: Q = Q(
    "trend_by_month",
    (s, dir) => table(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("anio"), month(col("o_orderdate")).as("mes"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("anio", "mes"),
    Some(
      """SELECT year(o_orderdate) AS anio, month(o_orderdate) AS mes,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY anio, mes""".stripMargin))

  /** Q1-style wide aggregation (A4): grouped sums/avg/count on lineitem. */
  val q1Agg: Q = Q(
    "q1_agg",
    (s, dir) => table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Daily per-client balance snapshots — `events` plays the snapshot
    * history (FIXTURES.md §3: ts→FechaCarga, user_id→cliente,
    * value→balance). Shared base for A5/W1/A6. */
  private def snapshots(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.etl.Sources.events(s, dir)
      .groupBy(
        col("user_id").as("id_cliente"),
        to_date(col("ts")).as("fecha_carga"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("open_balance"))

  private val ddbSnapshots =
    """SELECT user_id AS id_cliente, CAST(ts AS DATE) AS fecha_carga,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS open_balance
      |FROM events GROUP BY 1, 2""".stripMargin

  /** A5 — latest-snapshot selection via scalar-subquery max (Cartera PDF
    * §7: `WHERE FechaCarga = (SELECT MAX(FechaCarga) ...)`). The 1-row
    * max aggregate is broadcast so the fact side never shuffles for the
    * filter. */
  val latestSnapshot: Q = Q(
    "latest_snapshot",
    (s, dir) => {
      val snaps = snapshots(s, dir)
      val maxDate = snaps.agg(max(col("fecha_carga")).as("__max_fc"))
      snaps
        .join(broadcast(maxDate), col("fecha_carga") === col("__max_fc"))
        .select(
          col("id_cliente"),
          date_format(col("fecha_carga"), "yyyy-MM-dd").as("fecha_carga"),
          col("open_balance"))
        .orderBy("id_cliente")
    },
    Some(
      s"""WITH snaps AS ($ddbSnapshots)
         |SELECT id_cliente, strftime(fecha_carga, '%Y-%m-%d') AS fecha_carga, open_balance
         |FROM snaps
         |WHERE fecha_carga = (SELECT MAX(fecha_carga) FROM snaps)
         |ORDER BY id_cliente""".stripMargin))

  /** A6 — DISTINCT TOP-k snapshot dates (Cartera PDF §7:
    * `SELECT DISTINCT TOP 2 FechaCarga ... ORDER BY FechaCarga DESC`). */
  val distinctTopSnapshots: Q = Q(
    "distinct_top_snapshots",
    (s, dir) => graft.etl.Sources.events(s, dir)
      .select(to_date(col("ts")).as("fecha_carga"))
      .distinct()
      .orderBy(desc("fecha_carga"))
      .limit(2)
      .select(date_format(col("fecha_carga"), "yyyy-MM-dd").as("fecha_carga")),
    Some(
      """SELECT strftime(fecha_carga, '%Y-%m-%d') AS fecha_carga FROM (
        |  SELECT DISTINCT CAST(ts AS DATE) AS fecha_carga FROM events
        |  ORDER BY fecha_carga DESC LIMIT 2)
        |ORDER BY fecha_carga DESC""".stripMargin))

  /** W1 — day-over-day snapshot comparison (Cartera PDF §7 "Comparación
    * Mensual"): restrict to the 2 latest snapshot dates (A6), then
    * `LAG(open_balance) OVER (PARTITION BY id_cliente ORDER BY
    * fecha_carga)`. */
  val snapshotLag: Q = Q(
    "snapshot_lag",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val snaps = snapshots(s, dir)
      val top2 = snaps.select(col("fecha_carga")).distinct()
        .orderBy(desc("fecha_carga")).limit(2)
      val w = Window.partitionBy(col("id_cliente")).orderBy(col("fecha_carga"))
      snaps
        .join(broadcast(top2), Seq("fecha_carga"))
        .withColumn("prev_balance", lag(col("open_balance"), 1).over(w))
        .select(
          col("id_cliente"),
          date_format(col("fecha_carga"), "yyyy-MM-dd").as("fecha_carga"),
          col("open_balance"),
          col("prev_balance"),
          (col("open_balance").cast("decimal(18,2)") -
            col("prev_balance").cast("decimal(18,2)")).cast("double")
            .as("variacion"))
        .orderBy("id_cliente", "fecha_carga")
    },
    Some(
      s"""WITH snaps AS ($ddbSnapshots),
         |top2 AS (SELECT DISTINCT fecha_carga FROM snaps ORDER BY fecha_carga DESC LIMIT 2),
         |lagged AS (
         |  SELECT s.id_cliente, s.fecha_carga, s.open_balance,
         |         LAG(s.open_balance) OVER (PARTITION BY s.id_cliente ORDER BY s.fecha_carga) AS prev_balance
         |  FROM snaps s JOIN top2 USING (fecha_carga))
         |SELECT id_cliente, strftime(fecha_carga, '%Y-%m-%d') AS fecha_carga,
         |       open_balance, prev_balance,
         |       CAST(CAST(open_balance AS DECIMAL(18,2)) - CAST(prev_balance AS DECIMAL(18,2)) AS DOUBLE) AS variacion
         |FROM lagged
         |ORDER BY id_cliente, fecha_carga""".stripMargin))

  /** J6 + A4 — fact ⋈ dim grouped totals (Pending Orders PDF §7 "Análisis
    * por Cliente y Zona"): orders ⋈ customer, grouped by client + zone,
    * ordered by total DESC. */
  val clientZoneTotals: Q = Q(
    "client_zone_totals",
    (s, dir) => table(s, dir, "orders")
      .join(broadcast(table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name").as("nombre_cliente"), col("c_nationkey").as("id_zone"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(desc("total"), col("nombre_cliente")),
    Some(
      """SELECT c_name AS nombre_cliente, c_nationkey AS id_zone,
        |       count(*) AS n_docs,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2
        |ORDER BY total DESC, nombre_cliente""".stripMargin))

  /** Semi-structured parsing: the events `props` column is a JSON string
    * (`{"k": 69}`); parse it with an explicit schema (from_json — typed,
    * codegen'd, no string re-parsing downstream) and aggregate on the
    * extracted field. */
  val propsJson: Q = Q(
    "events_props_json",
    (s, dir) => graft.etl.Sources.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
      .orderBy("event_type", "k_bucket"),
    Some(
      """SELECT event_type,
        |       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |       count(*) AS n,
        |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, k_bucket""".stripMargin))

  /** Hierarchical subtotal aggregation (ROLLUP): per (flag, status),
    * per-flag subtotal, and grand total in ONE pass — Spark expands the
    * grouping sets map-side, so the shuffle still carries one row per
    * (group, level) and the scan runs once; N separate GROUP BYs would
    * scan N times. Null group keys (the subtotal levels) are projected
    * to an 'ALL' sentinel so ordering and hashing are engine-neutral
    * (data values are single-char codes, so the sentinel cannot
    * collide). */
  val rollupFlagStatus: Q = Q(
    "olap_rollup",
    (s, dir) => table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))
      .orderBy("flag", "status"),
    Some(
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin))

  /** Full cross-dimensional subtotals (CUBE) over the event stream:
    * every (type, month) combination plus both marginals and the grand
    * total, one scan + one shuffle (2^dims grouping sets expanded
    * map-side). The month key is computed BEFORE the cube so the
    * subtotal levels group on the derived value. */
  val cubeTypeMonth: Q = Q(
    "olap_cube",
    (s, dir) => graft.etl.Sources.events(s, dir)
      .select(col("event_type"), month(col("ts")).as("mes"), col("value"))
      .cube(col("event_type"), col("mes"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("mes"), lit(-1)).as("mes"),
        col("n"), col("total"))
      .orderBy("event_type", "mes"),
    Some(
      """SELECT COALESCE(event_type, 'ALL') AS event_type,
        |       COALESCE(month(ts), -1) AS mes,
        |       count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY CUBE (event_type, month(ts))
        |ORDER BY event_type, mes""".stripMargin))

  /** Long→wide reshaping (PIVOT) with an EXPLICIT value list: without
    * it Spark runs a distinct-values discovery job over the whole
    * input before planning — a full extra scan at 100 TB, and a
    * nondeterministic schema besides. Absent cells coalesce to 0 so
    * the wide row is total. */
  val pivotStatusQty: Q = Q(
    "olap_pivot",
    (s, dir) => table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("O", "F"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")))
      .select(col("l_returnflag"),
        coalesce(col("O"), lit(BigDecimal(0))).cast("double").as("qty_open"),
        coalesce(col("F"), lit(BigDecimal(0))).cast("double").as("qty_filled"))
      .orderBy("l_returnflag"),
    Some(
      """SELECT l_returnflag,
        |       CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O'), 0) AS DOUBLE) AS qty_open,
        |       CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F'), 0) AS DOUBLE) AS qty_filled
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))

  /** Rolling time-window aggregate: trailing-7-day moving average of
    * daily order revenue. RANGE framing on the day number — NOT rows —
    * so calendar gaps shorten the window instead of silently reaching
    * further back (the classic rows-vs-range bug). Two-level shape: the
    * daily pre-aggregate shrinks 100 TB of orders to one row per day
    * BEFORE the window, so the RANGE window runs over days, not orders.
    * The moving average is one exact DECIMAL window-sum divided by one
    * window-count in DOUBLE — a single division, not a running double
    * average, so both engines produce the identical bits. */
  val trendMovingAvg: Q = Q(
    "trend_moving_avg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // non-foldable constant partition key over the bounded per-day
      // frame (see TextQueries quality-ntile for the idiom rationale)
      val w = Window.partitionBy(pmod(col("day_num"), lit(1)))
        .orderBy(col("day_num")).rangeBetween(-6, 0)
      table(s, dir, "orders")
        .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).as("day_num"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("day_total_dec"))
        .withColumn("win_total_dec", sum(col("day_total_dec")).over(w))
        .withColumn("win_days", count(lit(1)).over(w))
        .select(
          date_format(date_add(lit("1970-01-01"), col("day_num")), "yyyy-MM-dd")
            .as("day"),
          col("n_orders"),
          col("day_total_dec").cast("double").as("day_total"),
          (col("win_total_dec").cast("double") / col("win_days").cast("double"))
            .as("ma7"))
        .orderBy("day")
    },
    Some(
      """WITH d AS (
        |  SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num,
        |         count(*) AS n_orders,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total_dec
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day_num, n_orders, day_total_dec,
        |         SUM(day_total_dec) OVER win AS win_total_dec,
        |         COUNT(*) OVER win AS win_days
        |  FROM d
        |  WINDOW win AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT strftime(DATE '1970-01-01' + CAST(day_num AS INTEGER), '%Y-%m-%d') AS day,
        |       n_orders,
        |       CAST(day_total_dec AS DOUBLE) AS day_total,
        |       CAST(win_total_dec AS DOUBLE) / CAST(win_days AS DOUBLE) AS ma7
        |FROM w
        |ORDER BY day""".stripMargin))

  /** Ordered path/sequence analysis: each user's full event-type
    * journey as a '->'-joined string, ordered by (ts, event_id). One
    * shuffle (groupBy user) collecting (ts_us, event_id, type) structs,
    * then pure array HOFs — array_sort on the struct's natural
    * (ts, id)-lexicographic order, transform to the type, array_join —
    * all codegen'd, no window, no driver collect. Per-user memory is the
    * user's own event list: inherent to the operator (a path IS the
    * whole sequence) — the full-fidelity form for bounded fan-outs.
    * For 100×-skewed users, [[pathSeqCapped]] is the bounded variant:
    * same contract plus a truncation marker. */
  val pathSeq: Q = Q(
    "events_path_seq",
    (s, dir) => graft.etl.Sources.events(s, dir)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"))
      .agg(collect_list(col("e")).as("evs"))
      .select(col("user_id"),
        size(col("evs")).as("n_events"),
        array_join(
          transform(array_sort(col("evs")), e => e.getField("event_type")),
          "->").as("path"))
      .orderBy("user_id"),
    Some(
      """SELECT user_id, count(*) AS n_events,
        |       string_agg(event_type, '->'
        |                  ORDER BY epoch_us(ts), event_id) AS path
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin))

  /** Heavy-user cap for [[pathSeq]]: one pathological user (a bot, a
    * load test) otherwise owns an unbounded collect_list aggregation
    * buffer — the buffer is per-group heap memory and cannot spill
    * mid-group. Cap = keep only the FIRST [[PathSeqCap]] events per
    * user via a windowed row_number pre-filter: the per-user sort
    * under WindowExec spills to disk (an external sorter, unlike an
    * agg buffer), the filter drops everything past the cap BEFORE any
    * list is collected, so the collect_list buffer is ≤ cap structs
    * regardless of skew. The true event total rides the same shuffle
    * as an unbounded-frame count over the user partition, and rows
    * past the cap surface as `truncated` — a marker, never a silent
    * drop. One hash exchange on user_id for both window specs + the
    * aggregation. */
  val PathSeqCap = 64

  private[graft] def pathPrefix(events: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
    val ordered = byUser.orderBy(col("e"))
    events
      .select(col("user_id"),
        struct(col("ts_us"), col("event_id"), col("event_type")).as("e"))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n_total", count(lit(1)).over(byUser))
      .filter(col("rn") <= cap)
      .groupBy(col("user_id"))
      .agg(max(col("n_total")).as("n_events"),
        collect_list(col("e")).as("evs"))
      .select(col("user_id"), col("n_events"),
        (col("n_events") > cap).as("truncated"),
        array_join(
          transform(array_sort(col("evs")), e => e.getField("event_type")),
          "->").as("path_prefix"))
  }

  val pathSeqCapped: Q = Q(
    "events_path_seq_capped",
    (s, dir) => pathPrefix(
      graft.etl.Sources.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type")),
      PathSeqCap).orderBy("user_id"),
    Some(
      s"""WITH r AS (
         |  SELECT user_id, event_type,
         |         row_number() OVER (PARTITION BY user_id
         |           ORDER BY epoch_us(ts), event_id) AS rn,
         |         count(*) OVER (PARTITION BY user_id) AS n_total
         |  FROM events)
         |SELECT user_id, max(n_total) AS n_events,
         |       max(n_total) > $PathSeqCap AS truncated,
         |       string_agg(event_type, '->' ORDER BY rn) AS path_prefix
         |FROM r WHERE rn <= $PathSeqCap
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin))

  /** Relational set difference: churn candidates — customers with no
    * order in the final 90 days of the data. `EXCEPT` compiles to a
    * distinct left-anti hash join — the build side is the (smaller,
    * distinct) recent-order key set, and a runtime bloom/broadcast
    * kicks in under AQE when it fits. The cutoff derives from
    * max(o_orderdate) as a 1-row broadcast scalar (never a driver
    * collect); the cutoff compare is a post-scan filter (it depends on
    * the broadcast value — only a literal cutoff could push into the
    * parquet scan; with date-partitioned storage this same shape gets
    * dynamic partition pruning instead). The mktsegment breakdown
    * keeps the output meaningfully aggregated. */
  val churnCandidates: Q = Q(
    "set_except_customers",
    (s, dir) => {
      val orders = table(s, dir, "orders")
      val cutoff = orders
        .agg(date_sub(max(col("o_orderdate")).cast("date"), 90).as("cut"))
      val recent = orders.select(col("o_custkey").as("c_custkey"),
          col("o_orderdate"))
        .crossJoin(broadcast(cutoff))
        .filter(col("o_orderdate").cast("date") >= col("cut"))
        .select(col("c_custkey"))
      table(s, dir, "customer").select(col("c_custkey"))
        .except(recent)
        .join(table(s, dir, "customer"), Seq("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_lapsed"),
          min(col("c_custkey")).as("min_custkey"))
        .orderBy("c_mktsegment")
    },
    Some(
      """WITH lapsed AS (
        |  SELECT c_custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey FROM orders
        |  WHERE CAST(o_orderdate AS DATE) >=
        |        (SELECT CAST(max(o_orderdate) AS DATE) - INTERVAL 90 DAY
        |         FROM orders))
        |SELECT c_mktsegment, count(*) AS n_lapsed,
        |       min(c_custkey) AS min_custkey
        |FROM lapsed JOIN customer USING (c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin))

  /** Ratio-to-report (percent of total): each order priority's share of
    * total revenue. The grand total is a 1-row aggregate of the
    * PRE-AGGREGATED per-priority rows, broadcast back by cross join (an
    * unpartitioned window over the same rows computes the same value
    * but moves them to a single partition and spams the WindowExec
    * warning — same result, worse shape; r10 cleanup). The share is one
    * decimal-by-decimal division evaluated in DOUBLE once, so both
    * engines produce identical bits. */
  val revenueShare: Q = Q(
    "revenue_share",
    (s, dir) => {
      val per = table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"))
      val grand = per.agg(sum(col("rev_dec")).as("grand_dec"))
      per.crossJoin(broadcast(grand))
        .select(col("o_orderpriority"),
          col("rev_dec").cast("double").as("revenue"),
          (col("rev_dec").cast("double") / col("grand_dec").cast("double"))
            .as("share"))
        .orderBy("o_orderpriority")
    },
    Some(
      """WITH p AS (
        |  SELECT o_orderpriority,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority,
        |       CAST(rev_dec AS DOUBLE) AS revenue,
        |       CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS share
        |FROM p
        |ORDER BY o_orderpriority""".stripMargin))

  /** Explicit GROUPING SETS — the general grouping-lattice operator
    * that ROLLUP/CUBE are shorthands for, over a set selection NEITHER
    * can express: ((flag, status), (status), ()) — detail, one chosen
    * marginal, grand total, skipping the (flag) marginal a rollup would
    * force. Same one-scan/one-shuffle Expand execution as the rollup.
    * `grouping()` flags (cast BIGINT on both engines) disambiguate a
    * real 'ALL' data value from the subtotal sentinel — the
    * belt-and-braces the coalesce-sentinel queries don't need because
    * their domains are single-char codes. */
  val groupingSetsFlagStatus: Q = Q(
    "olap_grouping_sets",
    (s, dir) => table(s, dir, "lineitem")
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("bigint").as("g_flag"),
        grouping(col("l_linestatus")).cast("bigint").as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
      .orderBy("g_flag", "g_status", "flag", "status"),
    Some(
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_flag, g_status, flag, status""".stripMargin))

  /** TPC-H Q5 shape (local-supplier volume): the 6-way star-snowflake
    * join — lineitem⋈orders⋈customer⋈supplier⋈nation⋈region with the
    * "local" predicate (customer and supplier share a nation), revenue
    * per nation in one region. The declarative payoff this engine bets
    * on: Catalyst broadcast-plans every dimension (region→nation 1-row/
    * 25-row broadcasts prune BEFORE the fact scan joins; customer/
    * supplier broadcast under AQE at this scale, shuffle-join above
    * it), picks the join order, and pushes the region filter through
    * the snowflake — none of it hand-scheduled. DECIMAL revenue, total
    * ORDER BY. */
  val q5LocalSupplierVolume: Q = Q(
    "tpch_q5_region_volume",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val ord = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = table(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val supp = table(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val nat = table(s, dir, "nation")
      val reg = table(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },
    Some(
      """SELECT n_name, count(*) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin))

  /** TPC-H Q3 shape (shipping priority): revenue of orders in one
    * market segment shipped after they were ordered — top 10 by
    * revenue. The selective predicates (segment on the dim, ship-after-
    * order on the fact crossing the join) plus TakeOrdered over the
    * aggregate: Catalyst pushes the segment filter into the customer
    * scan, the date comparison runs post-join (it crosses sides), and
    * the top-10 is TakeOrderedAndProject — no global sort. Ties fully
    * broken (revenue DESC, orderkey ASC). */
  val q3ShippingPriority: Q = Q(
    "tpch_q3_shipping_priority",
    (s, dir) => {
      val cust = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    },
    Some(
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin))

  /** TPC-H Q10 shape (returned-item reporting): the 20 customers whose
    * returned lineitems cost the most revenue. Selective fact filter
    * (returnflag = 'R') pushed into the parquet scan, customer⋈nation
    * broadcast onto the aggregated fact, top-20 as TakeOrdered. The
    * aggregate keys on the customer BEFORE the dim join — the shuffle
    * carries one row per customer, and the name/nation attach to the
    * 20-row result, not the fact table. */
  val q10ReturnedItems: Q = Q(
    "tpch_q10_returned_items",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val lost = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_returned_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("lost_revenue"))
      lost
        .join(broadcast(table(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("n_returned_lines"), col("lost_revenue"))
        .orderBy(desc("lost_revenue"), col("c_custkey"))
        .limit(20)
    },
    Some(
      """WITH lost AS (
        |  SELECT o_custkey, count(*) AS n_returned_lines,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |              AS DOUBLE) AS lost_revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, n_name, n_returned_lines, lost_revenue
        |FROM lost
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY lost_revenue DESC, c_custkey
        |LIMIT 20""".stripMargin))

  /** TPC-H Q8 shape (market share): one supplier-nation's share of a
    * region's revenue, per order year — the conditional-fraction
    * aggregation (sum-if / sum-all in ONE pass; two scans would read
    * the joined fact twice). Numerator and denominator are both exact
    * DECIMAL sums; the share is a single double division. */
  val q8MarketShare: Q = Q(
    "tpch_q8_market_share",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
      val cust = table(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val natC = table(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val reg = table(s, dir, "region").filter(col("r_name") === "EUROPE")
      val supp = table(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val natS = table(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(BigDecimal(1)).cast("decimal(18,2)") -
          col("l_discount").cast("decimal(18,2)"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "GERMANY", rev)
            .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)")))
            .cast("double").as("nation_rev"),
          sum(rev).cast("double").as("total_rev"))
        .select(col("o_year"), col("nation_rev"), col("total_rev"),
          (col("nation_rev") / col("total_rev")).as("mkt_share"))
        .orderBy("o_year")
    },
    Some(
      """SELECT year(o_orderdate) AS o_year,
        |       CAST(SUM(CASE WHEN sn.n_name = 'GERMANY'
        |                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS total_rev,
        |       CAST(SUM(CASE WHEN sn.n_name = 'GERMANY'
        |                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |                AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin))

  /** TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    * quantity is below 20% of their part's average — the per-group
    * threshold filter. The per-part average joins BACK onto the fact
    * (agg-then-join, the Q10 discipline): the threshold table is one
    * row per part and broadcasts; a window-avg formulation would
    * shuffle every lineitem instead. The average is an exact DECIMAL
    * sum over a BIGINT count, divided once in DOUBLE; the 0.2×
    * threshold compare is IEEE-exact on both engines. */
  val q17SmallQuantity: Q = Q(
    "tpch_q17_small_quantity",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val avgQ = li.groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))
      li.join(broadcast(avgQ.toDF("p_key", "avg_qty")),
          col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg(
          count(lit(1)).as("n_small_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("small_revenue"))
        .select(col("n_small_lines"), col("small_revenue"))
    },
    Some(
      """WITH a AS (
        |  SELECT l_partkey AS p_key,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT count(*) AS n_small_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS small_revenue
        |FROM lineitem JOIN a ON l_partkey = p_key
        |WHERE l_quantity < avg_qty * 0.2""".stripMargin))

  /** TPC-H Q4 shape (order-priority checking): orders with at least one
    * line shipped more than 60 days after the order date, counted per
    * priority — the correlated-EXISTS semi-join. LEFT SEMI with the
    * cross-side date predicate in the join condition: each order emits
    * at most once no matter how many late lines it has (an inner join
    * + distinct would shuffle the multiplicity first), and the fact
    * side carries only (orderkey, shipdate). */
  val q4OrderPriority: Q = Q(
    "tpch_q4_order_priority",
    (s, dir) => {
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate").cast("date") >
              date_add(col("o_orderdate").cast("date"), 60),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_late_orders"))
        .orderBy("o_orderpriority")
    },
    Some(
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND CAST(l.l_shipdate AS DATE) >
        |        CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin))

  /** Period-over-period comparison (YoY): each month's revenue against
    * the SAME month one year earlier — lag(12) over the month-indexed
    * series would be wrong on gap months; the join is on the explicit
    * (year−1, month) key instead, so a missing prior month yields NULL
    *→ 0-filled flag, never a mis-aligned lag. The monthly pre-aggregate
    * is the only pass over orders; the self-join runs on the ~tens-of-
    * rows month table. Delta is exact DECIMAL; pct is one double
    * division guarded by the prior-month presence flag. */
  val trendYoy: Q = Q(
    "trend_yoy",
    (s, dir) => {
      val monthly = table(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("anio"),
          month(col("o_orderdate")).as("mes"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"))
      val prior = monthly.select((col("anio") + 1).as("anio"), col("mes"),
        col("rev_dec").as("prior_dec"))
      monthly.join(prior, Seq("anio", "mes"), "left")
        .select(col("anio"), col("mes"),
          col("rev_dec").cast("double").as("revenue"),
          coalesce(col("prior_dec"), lit(BigDecimal(0)).cast("decimal(18,2)"))
            .cast("double").as("prior_revenue"),
          col("prior_dec").isNotNull.as("has_prior"),
          (col("rev_dec") - coalesce(col("prior_dec"),
            lit(BigDecimal(0)).cast("decimal(18,2)")))
            .cast("double").as("delta"),
          when(col("prior_dec").isNotNull,
            col("rev_dec").cast("double") / col("prior_dec").cast("double") - 1.0)
            .as("pct_change"))
        .orderBy("anio", "mes")
    },
    Some(
      """WITH m AS (
        |  SELECT year(o_orderdate) AS anio, month(o_orderdate) AS mes,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1, 2)
        |SELECT m.anio, m.mes,
        |       CAST(m.rev_dec AS DOUBLE) AS revenue,
        |       CAST(COALESCE(p.rev_dec, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
        |         AS prior_revenue,
        |       p.rev_dec IS NOT NULL AS has_prior,
        |       CAST(m.rev_dec - COALESCE(p.rev_dec, CAST(0 AS DECIMAL(18,2)))
        |            AS DOUBLE) AS delta,
        |       CASE WHEN p.rev_dec IS NOT NULL
        |            THEN CAST(m.rev_dec AS DOUBLE) / CAST(p.rev_dec AS DOUBLE) - 1.0
        |       END AS pct_change
        |FROM m LEFT JOIN m p ON p.anio = m.anio - 1 AND p.mes = m.mes
        |ORDER BY m.anio, m.mes""".stripMargin))

  /** TPC-H Q2 shape (minimum-cost supplier): for each part in a
    * filtered subset, the supplier(s) offering the corpus-wide minimum
    * line price — the correlated-scalar-subquery-in-WHERE pattern. The
    * Spark-first rewrite is agg-then-broadcast-join-back (the Q17
    * discipline): one pass computes the per-part DECIMAL min, the
    * tiny (part, min) table broadcasts back onto the fact, and the
    * equality filter keeps every min-price (supplier, part) pair —
    * preserving the classic query's multi-row tie semantics, which an
    * argmax would silently collapse. Supplier and nation dims attach
    * AFTER the distinct (attributes join onto winners, never the fact
    * table). The testdata has no partsupp table, so lineitem plays the
    * supply catalog: l_extendedprice is the offer price. */
  val q2MinCostSupplier: Q = Q(
    "tpch_q2_min_cost_supplier",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"))
      val parts = table(s, dir, "part")
        .filter(col("p_size") % 7 === 3)
        .select(col("p_partkey"))
      val offers = li.join(broadcast(parts),
        col("l_partkey") === col("p_partkey"))
      val minP = offers.groupBy(col("l_partkey"))
        .agg(min(col("price")).as("min_price"))
        .toDF("m_key", "min_price")
      val winners = offers
        .join(broadcast(minP), col("l_partkey") === col("m_key"))
        .filter(col("price") === col("min_price"))
        .select(col("p_partkey"), col("l_suppkey"), col("min_price"))
        .distinct()
      winners
        .join(broadcast(table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("min_price").cast("double").as("min_price"),
          col("s_suppkey"), col("s_name"), col("n_name"),
          col("s_acctbal").cast("decimal(18,2)").cast("double").as("acctbal"))
        .orderBy(desc("acctbal"), col("s_name"), col("p_partkey"))
    },
    Some(
      """WITH pl AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size % 7 = 3)),
        |w AS (
        |  SELECT DISTINCT p.l_partkey AS p_partkey, p.l_suppkey, p.price AS min_price
        |  FROM pl p
        |  WHERE p.price = (SELECT min(price) FROM pl p2
        |                   WHERE p2.l_partkey = p.l_partkey))
        |SELECT w.p_partkey, CAST(w.min_price AS DOUBLE) AS min_price,
        |       s.s_suppkey, s.s_name, n.n_name,
        |       CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM w
        |JOIN supplier s ON w.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |ORDER BY acctbal DESC, s.s_name, w.p_partkey""".stripMargin))

  /** TPC-H Q6 shape (forecast revenue change): the pure-scan query —
    * no join, no group key, just three selective range predicates and
    * one aggregate. Its entire 100 TB cost is whether the predicates
    * reach the parquet reader: shipdate/discount/quantity are all
    * plain comparisons on scan columns, so every one lands in
    * PushedFilters and row-group zone-maps prune before decode
    * (pinned in PlanShapeSpec). The four scanned columns are the
    * ReadSchema — nothing else decompresses. DECIMAL revenue product,
    * single-row output. */
  val q6ForecastRevenue: Q = Q(
    "tpch_q6_forecast_revenue",
    (s, dir) => table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)"))
          .cast("double").as("revenue_delta")),
    Some(
      """SELECT count(*) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue_delta
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin))

  /** TPC-H Q14 shape (promotion effect): conditional-fraction aggregate
    * over one month of fact⋈dim — promo revenue as a percentage of all
    * revenue. The month filter prunes the fact scan BEFORE the join
    * (PushedFilters), part broadcasts, and the CASE rides the same
    * aggregate pass as the denominator — one scan, one broadcast, zero
    * shuffles beyond the final 1-row agg. Both DECIMAL sums cast to
    * double, then one pinned multiply-divide. */
  val q14PromoEffect: Q = Q(
    "tpch_q14_promo_effect",
    (s, dir) => table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .join(broadcast(table(s, dir, "part")
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
          .otherwise(lit(BigDecimal(0)).cast("decimal(38,4)")))
          .as("promo"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("total"))
      .select(
        (col("promo").cast("double") * lit(100.0) /
          col("total").cast("double")).as("promo_pct"),
        col("promo").cast("double").as("promo_revenue"),
        col("total").cast("double").as("total_revenue")),
    Some(
      """WITH a AS (
        |  SELECT
        |    SUM(CASE WHEN p_type = 'PROMO'
        |             THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |             ELSE CAST(0 AS DECIMAL(38,4)) END) AS promo,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01')
        |SELECT CAST(promo AS DOUBLE) * 100.0 / CAST(total AS DOUBLE) AS promo_pct,
        |       CAST(promo AS DOUBLE) AS promo_revenue,
        |       CAST(total AS DOUBLE) AS total_revenue
        |FROM a""".stripMargin))

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    * OR of three conjunctions that each cross the join — brand/size
    * from part AND a quantity band from lineitem. The textbook scale
    * trap: the disjunction references both sides, so no single branch
    * can push below the join and the filter runs post-join over the
    * full fact table. The classic manual fix, applied here: the
    * IMPLIED single-side envelopes (brand ∈ the three brands, size ≤
    * the max band, quantity ≤ the max band) are added as redundant
    * conjuncts — Catalyst pushes them into both scans (PushedFilters
    * on brand list + quantity range), the broadcast side shrinks to
    * the three brands, and the exact disjunction then evaluates over
    * the pre-pruned join output. Semantics are unchanged (each
    * envelope is implied by the OR); the scan cost drops from "all
    * rows" to "rows any branch could accept". */
  val q19Disjunctive: Q = Q(
    "tpch_q19_disjunctive",
    (s, dir) => {
      val branch =
        (col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#20" &&
          col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" &&
          col("p_size").between(1, 15) && col("l_quantity").between(20, 30))
      table(s, dir, "lineitem")
        .filter(col("l_quantity").between(1, 30))
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_brand").isin("Brand#12", "Brand#20", "Brand#24") &&
            col("p_size").between(1, 15))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(branch)
        .agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
    },
    Some(
      """SELECT count(*) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  /** Retention cohort triangle: users bucketed by first-activity week,
    * tracked across later weeks — the canonical product-analytics cohort
    * query. Weeks are exact integer day-offsets from the corpus epoch
    * divided by 7 (calendar-week truncation differs in locale defaults
    * across engines; the epoch-offset week is engine-neutral). Plan: ONE
    * heavy shuffle — `collect_set(week)` per user with map-side partial
    * dedup, per-user state bounded by the CALENDAR (distinct weeks in
    * the corpus span), never by activity volume; cohort week is
    * `array_min` on the set, offsets explode from it, and the (cohort,
    * offset) aggregate shuffles one row per user-week. Cohort size rides
    * a partitioned window over the ≤|weeks|² aggregate rows — no global
    * window anywhere. */
  val retentionCohorts: Q = Q(
    "events_retention_cohorts",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val week = floor(
        datediff(col("ts").cast("date"), lit("2024-01-01")) / lit(7.0))
        .cast("int").as("week")
      val perUser = graft.etl.Sources.events(s, dir)
        .select(col("user_id"), week)
        .groupBy(col("user_id"))
        .agg(collect_set(col("week")).as("weeks"))
        .select(array_min(col("weeks")).as("cohort_week"),
          explode(col("weeks")).as("week"))
      val tri = perUser
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
      tri.withColumn("cohort_size",
          sum(when(col("week_offset") === 0, col("n_users")))
            .over(Window.partitionBy(col("cohort_week"))))
        .select(col("cohort_week"), col("week_offset"), col("n_users"),
          col("cohort_size"),
          (col("n_users").cast("double") / col("cohort_size").cast("double"))
            .as("retention_pct"))
        .orderBy("cohort_week", "week_offset")
    },
    Some(
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |         CAST(FLOOR(datediff('day', DATE '2024-01-01',
        |                             CAST(ts AS DATE)) / 7.0) AS INT) AS week
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id),
        |tri AS (
        |  SELECT cohort_week, week - cohort_week AS week_offset,
        |         count(*) AS n_users
        |  FROM uw JOIN c USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_users,
        |       CAST(SUM(CASE WHEN week_offset = 0 THEN n_users END)
        |              OVER (PARTITION BY cohort_week) AS BIGINT) AS cohort_size,
        |       CAST(n_users AS DOUBLE) /
        |       CAST(CAST(SUM(CASE WHEN week_offset = 0 THEN n_users END)
        |              OVER (PARTITION BY cohort_week) AS BIGINT)
        |            AS DOUBLE) AS retention_pct
        |FROM tri
        |ORDER BY cohort_week, week_offset""".stripMargin))

  /** Rolling 7-day active users per day (DAU/WAU/stickiness) — the
    * sliding-window DISTINCT count, which no window frame can express
    * (distinct doesn't decompose over frame slides). Shape: the distinct
    * (user, day) activity set explodes each row into the ≤7 trailing
    * window-days it serves, a second distinct collapses multi-day users
    * per window, and the per-window count shuffles one row per
    * user-window pair — a constant 7× linear expansion, never a
    * per-window user-set buffer. Window days past the corpus edge are
    * clipped against the broadcast 1-row max. DAU attaches by joining
    * the two tiny per-day aggregates. */
  val rollingActive: Q = Q(
    "events_rolling_active",
    (s, dir) => {
      val day = datediff(col("ts").cast("date"), lit("2024-01-01")).as("day")
      val uw = graft.etl.Sources.events(s, dir)
        .select(col("user_id"), day).distinct()
      val dau = uw.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val maxDay = uw.agg(max(col("day")).as("max_day"))
      val wau = uw
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("window_day"))
        .crossJoin(broadcast(maxDay))
        .filter(col("window_day") <= col("max_day"))
        .select(col("user_id"), col("window_day")).distinct()
        .groupBy(col("window_day")).agg(count(lit(1)).as("wau7"))
      dau.join(wau, col("day") === col("window_day"))
        .select(col("day"), col("dau"), col("wau7"),
          (col("dau").cast("double") / col("wau7").cast("double"))
            .as("stickiness"))
        .orderBy("day")
    },
    Some(
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM uw GROUP BY day),
        |m AS (SELECT MAX(day) AS max_day FROM uw),
        |expand AS (
        |  SELECT DISTINCT user_id, day + off AS window_day
        |  FROM uw, (SELECT unnest(generate_series(0, 6)) AS off), m
        |  WHERE day + off <= max_day),
        |wau AS (SELECT window_day, count(*) AS wau7 FROM expand GROUP BY window_day)
        |SELECT day, dau, wau7,
        |       CAST(dau AS DOUBLE) / CAST(wau7 AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON day = window_day
        |ORDER BY day""".stripMargin))

  /** Skyline / Pareto-front query (Börzsönyi et al. 2001): the parts no
    * other part dominates — here maximize p_size while minimizing
    * p_retailprice (a part is OUT if some part is at least as large AND
    * at least as cheap, strictly better in one). The naive formulation
    * is a quadratic NOT-EXISTS self-theta-join — exactly what the
    * DuckDB oracle runs, proving the aggregate formulation loses
    * nothing.
    *
    * Scale-safe 2D formulation: dominance only depends on the cheapest
    * price AT each size and the cheapest price ABOVE each size, so
    * (1) one map-side-combining groupBy folds the fact table to ≤
    * |distinct sizes| rows; (2) a running min over that tiny aggregate
    * (ordered by size DESC, frame ending 1 PRECEDING — the window
    * never sees the fact table) yields best_above(size); (3) the
    * survivors join back BROADCAST: keep (size, price) iff price is
    * the min at its size and strictly beats every larger size's min.
    * Co-equal parts (same size, same min price) all survive — neither
    * strictly dominates the other, and the equality is comparison-only
    * (no double arithmetic to drift). One shuffle total, O(|sizes|)
    * window state. */
  val skylineParts: Q = Q(
    "olap_skyline",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val part = table(s, dir, "part")
      val perSize = part.groupBy(col("p_size"))
        .agg(min(col("p_retailprice")).as("mn"))
      val above = Window.partitionBy(pmod(col("p_size"), lit(1)))
        .orderBy(col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val front = perSize
        .withColumn("best_above", min(col("mn")).over(above))
        .filter(col("best_above").isNull || col("mn") < col("best_above"))
      part.join(broadcast(front), Seq("p_size"))
        .filter(col("p_retailprice") === col("mn"))
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
        .orderBy("p_size", "p_partkey")
    },
    Some(
      """SELECT p.p_partkey, p.p_size, p.p_retailprice
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        |    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
        |ORDER BY p_size, p_partkey""".stripMargin))

  /** First-order Markov transition matrix over per-user event streams —
    * the behavioral model a synthetic-data generator or sequence-QA
    * pipeline fits: count (prev_type → type) transitions along each
    * user's (ts, event_id)-ordered stream, with per-source-state
    * probabilities. One LAG window (shuffle on user_id — the same key
    * every sessionization query shuffles on) folds to a ≤|types|²-row
    * transition table; probabilities are exact-integer counts divided
    * once at the end (long/long in DOUBLE — deterministic IEEE, same
    * expression both engines). */
  val markovTransitions: Q = Q(
    "events_markov_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = graft.etl.Sources.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n_trans"))
      val tot = tr.groupBy(col("prev_type"))
        .agg(sum(col("n_trans")).as("n_from"))
      tr.join(broadcast(tot), Seq("prev_type"))
        .select(col("prev_type"), col("event_type"), col("n_trans"),
          col("n_from"),
          (col("n_trans").cast("double") / col("n_from").cast("double"))
            .as("p"))
        .orderBy("prev_type", "event_type")
    },
    Some(
      """WITH tr AS (
        |  SELECT prev_type, event_type, count(*) AS n_trans FROM (
        |    SELECT event_type,
        |           LAG(event_type) OVER (
        |             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |    FROM events)
        |  WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS n_from
        |        FROM tr GROUP BY 1)
        |SELECT tr.prev_type, tr.event_type, tr.n_trans, tot.n_from,
        |       CAST(tr.n_trans AS DOUBLE) / CAST(tot.n_from AS DOUBLE) AS p
        |FROM tr JOIN tot USING (prev_type)
        |ORDER BY prev_type, event_type""".stripMargin))

  /** Robust hourly-volume anomaly detection via median absolute
    * deviation — the outlier rule that survives the outliers it hunts
    * (a mean/stddev z-score is dragged by the very spikes it should
    * flag; IQR is [[dq_outlier_iqr]]'s rule). Hourly grain because
    * that is where the fixture's planted traffic bursts live (the
    * `events_range_burst` hot hours) — daily volumes are uniform and
    * flag nothing. Medians are LOWER medians (rank-ceil(N/2) under the
    * fully tie-broken (value, hour) order) — exact integers, no
    * interpolation to diverge between engines. The fact table folds to
    * ≤|hours| rows in one map-side-combining groupBy; both median
    * reads and the deviation join run over that bounded aggregate (the
    * documented bounded-window precedent). Emits flagged hours:
    * |n − med| > 3·1.4826·MAD (the normal-consistency constant; pure
    * double multiply, comparison-only). */
  val anomalyMad: Q = Q(
    "events_anomaly_mad",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = graft.etl.Sources.events(s, dir)
        .groupBy((floor(unix_timestamp(col("ts")) / lit(3600L)) -
          lit(java.time.LocalDate.parse("2024-01-01")
            .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond / 3600L))
          .as("hour"))
        .agg(count(lit(1)).as("n_events"))
      val byN = Window.partitionBy(pmod(col("hour"), lit(1)))
        .orderBy(col("n_events"), col("hour"))
      val nHours = hourly.agg(count(lit(1)).as("nh"),
        ceil(count(lit(1)) / lit(2.0)).as("mid"))
      val med = hourly
        .withColumn("rn", row_number().over(byN))
        .crossJoin(broadcast(nHours))
        .filter(col("rn") === col("mid"))
        .select(col("n_events").as("med"))
      val dev = hourly.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("n_events") - col("med")))
      val byDev = Window.partitionBy(pmod(col("hour"), lit(1)))
        .orderBy(col("dev"), col("hour"))
      val mad = dev
        .withColumn("rn", row_number().over(byDev))
        .crossJoin(broadcast(nHours))
        .filter(col("rn") === col("mid"))
        .select(col("dev").as("mad"))
      dev.crossJoin(broadcast(mad))
        .filter(col("dev").cast("double") >
          lit(3.0) * lit(1.4826) * col("mad").cast("double"))
        .select(col("hour"), col("n_events"), col("med"), col("mad"),
          col("dev"))
        .orderBy("hour")
    },
    Some(
      """WITH hourly AS (
        |  SELECT datediff('hour', TIMESTAMP '2024-01-01 00:00:00',
        |                  date_trunc('hour', ts)) AS hour,
        |         count(*) AS n_events
        |  FROM events GROUP BY 1),
        |nh AS (SELECT count(*) AS nh, CAST(ceiling(count(*) / 2.0) AS BIGINT) AS mid
        |       FROM hourly),
        |med AS (
        |  SELECT n_events AS med FROM (
        |    SELECT n_events, row_number() OVER (ORDER BY n_events, hour) AS rn
        |    FROM hourly), nh WHERE rn = mid),
        |dev AS (
        |  SELECT h.hour, h.n_events, m.med, abs(h.n_events - m.med) AS dev
        |  FROM hourly h, med m),
        |mad AS (
        |  SELECT dev AS mad FROM (
        |    SELECT dev, hour, row_number() OVER (ORDER BY dev, hour) AS rn
        |    FROM dev), nh WHERE rn = mid)
        |SELECT d.hour, d.n_events, d.med, d.mad_dev AS mad, d.dev FROM (
        |  SELECT dev.*, mad.mad AS mad_dev FROM dev, mad) d
        |WHERE CAST(d.dev AS DOUBLE) > 3.0 * 1.4826 * CAST(d.mad_dev AS DOUBLE)
        |ORDER BY d.hour""".stripMargin))

  /** Exact per-group median (LOWER median: the rank-ceil(N/2) element
    * under the fully tie-broken (value, key) order — no interpolation,
    * so both engines agree bit-for-bit even on even group sizes) of
    * order totals per month. The grouped exact order statistic the
    * approximate paths (`sketch_quantile_rollup`, the bottom-k sampler)
    * trade away: one shuffle on the group key, one in-partition sort —
    * at 100 TB per-group medians are a sort-within-groups problem
    * (WindowExec's external sorter spills), not a driver problem. */
  val groupMedian: Q = Q(
    "olap_group_median",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val monthCol = date_format(col("o_orderdate"), "yyyy-MM")
      val o = table(s, dir, "orders")
        .select(monthCol.as("month"), col("o_totalprice").as("v"),
          col("o_orderkey"))
      val byV = Window.partitionBy(col("month"))
        .orderBy(col("v"), col("o_orderkey"))
      val byM = Window.partitionBy(col("month"))
      o.withColumn("rn", row_number().over(byV))
        .withColumn("n", count(lit(1)).over(byM))
        .filter(col("rn") === ceil(col("n") / lit(2.0)))
        .select(col("month"), col("n").as("n_orders"), col("v").as("median_total"))
        .orderBy("month")
    },
    Some(
      """WITH o AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |         o_totalprice AS v, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT month, v,
        |         row_number() OVER (PARTITION BY month ORDER BY v, o_orderkey) AS rn,
        |         count(*) OVER (PARTITION BY month) AS n
        |  FROM o)
        |SELECT month, CAST(n AS BIGINT) AS n_orders, v AS median_total
        |FROM r
        |WHERE rn = ceiling(n / 2.0)
        |ORDER BY month""".stripMargin))

  /** Per-group MODE (most frequent value, count ties to the
    * lexicographically smaller value — fully deterministic where SQL's
    * MODE() leaves ties implementation-defined): dominant return flag
    * (`l_returnflag`) per ship month. Two-level aggregate — (month, mode) counts fold map-side,
    * then one partial-aggregating argmax per month — so the shuffle
    * carries one row per distinct (group, value) pair, never the fact
    * table, and no window sort anywhere. */
  val groupMode: Q = Q(
    "olap_group_mode",
    (s, dir) => {
      val monthCol = date_format(col("l_shipdate"), "yyyy-MM")
      table(s, dir, "lineitem")
        .groupBy(monthCol.as("month"), col("l_returnflag").as("mode_value"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("month"))
        // min over (-count, value): largest count first, then the
        // lexicographically SMALLEST value on ties (a max-struct can't
        // order strings descending, so the count rides negated)
        .agg(min(struct((-col("c")).as("nc"), col("mode_value").as("v")))
          .as("m"),
          sum(col("c")).as("n_rows"))
        .select(col("month"),
          col("m.v").as("mode_value"), (-col("m.nc")).as("mode_count"),
          col("n_rows"))
        .orderBy("month")
    },
    Some(
      """WITH g AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |         l_returnflag AS mode_value, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT month, mode_value, c,
        |         row_number() OVER (
        |           PARTITION BY month ORDER BY c DESC, mode_value ASC) AS rk,
        |         sum(c) OVER (PARTITION BY month) AS n
        |  FROM g)
        |SELECT month, mode_value, c AS mode_count, CAST(n AS BIGINT) AS n_rows
        |FROM r WHERE rk = 1
        |ORDER BY month""".stripMargin))

  /** Feature-snapshot instants (query parameters, inside the events
    * fixture's 2024-01 span at every scale factor). */
  private val FeatureSnapshotTs = "2024-01-28 00:00:00"
  private val FeatureWindow7dTs = "2024-01-21 00:00:00"

  /** Per-user ML feature snapshot AS OF a fixed instant — the
    * feature-store materialization shape (recency / frequency /
    * monetary + last-event state): total and trailing-7-day event
    * counts, distinct event types, 7-day value sum, hours since last
    * event, and the last event's type. Everything folds in ONE
    * map-side-combining groupBy(user): counts and the decimal-exact
    * value sum are plain conditional aggregates, the last-event state
    * is a partial-aggregating max(struct(ts, event_id, type)) — no
    * window, no self-join, one shuffle carrying one row per user. The
    * as-of filter pushes to the parquet scan. Recency is computed in
    * exact micros (unix_micros DIV), never float seconds, so the hash
    * gate holds. At 100 TB this is the nightly feature-table build;
    * the training-time point-in-time join against it is
    * `events_asof_*`. */
  val userFeatures: Q = Q(
    "events_user_features",
    (s, dir) => {
      val snapTs = to_timestamp(lit(FeatureSnapshotTs))
      val w7 = to_timestamp(lit(FeatureWindow7dTs))
      graft.etl.Sources.events(s, dir)
        .filter(col("ts") <= snapTs)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("ts") >= w7, 1L).otherwise(0L)).as("n_events_7d"),
          size(collect_set(col("event_type"))).cast("long").as("n_types"),
          sum(when(col("ts") >= w7, col("value").cast("decimal(18,2)")))
            .cast("double").as("value_7d_raw"),
          max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"))
        .select(col("user_id"), col("n_events"), col("n_events_7d"),
          col("n_types"),
          coalesce(col("value_7d_raw"), lit(0.0)).as("value_7d"),
          ((unix_micros(snapTs) - unix_micros(col("last.ts"))) / lit(3600000000L))
            .cast("long").as("hours_since_last"),
          col("last.event_type").as("last_event_type"))
        .orderBy("user_id")
    },
    Some(
      s"""WITH e AS (
         |  SELECT * FROM events WHERE ts <= TIMESTAMP '$FeatureSnapshotTs'),
         |lastpick AS (
         |  SELECT user_id, event_type AS last_event_type, ts AS last_ts
         |  FROM (SELECT user_id, event_type, ts,
         |          row_number() OVER (PARTITION BY user_id
         |            ORDER BY ts DESC, event_id DESC) AS rk
         |        FROM e) WHERE rk = 1),
         |agg AS (
         |  SELECT user_id,
         |         count(*) AS n_events,
         |         CAST(sum(CASE WHEN ts >= TIMESTAMP '$FeatureWindow7dTs' THEN 1 ELSE 0 END) AS BIGINT) AS n_events_7d,
         |         count(DISTINCT event_type) AS n_types,
         |         COALESCE(CAST(sum(CASE WHEN ts >= TIMESTAMP '$FeatureWindow7dTs' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS value_7d
         |  FROM e GROUP BY user_id)
         |SELECT a.user_id, a.n_events, a.n_events_7d, a.n_types, a.value_7d,
         |       (epoch_us(TIMESTAMP '$FeatureSnapshotTs') - epoch_us(l.last_ts)) // 3600000000 AS hours_since_last,
         |       l.last_event_type
         |FROM agg a JOIN lastpick l USING (user_id)
         |ORDER BY user_id""".stripMargin))

  /** Inactivity gap that closes a session. The events fixture's median
    * per-user inter-event gap is ~7.3 h (measured at sf0.01), so 8 h
    * splits streams into multi-event sessions rather than singletons;
    * real clickstreams would use 30 min — the shape is identical, only
    * the literal changes. */
  private val SessionGapUs = 8L * 3600 * 1000000

  /** Batch gap-based sessionization — the canonical clickstream
    * operator (the batch twin of `stream_sessionization`): a session is
    * a maximal run of per-user events with no `gapUs` silence between
    * neighbors. One shuffle on user_id serves the LAG + running SUM
    * window pair; the per-session rollup then map-side-combines on
    * (user_id, session_idx), so the whole query is the sessionization
    * minimum of one wide shuffle — at 100 TB this is the same
    * hash-on-user layout every other per-user query here reuses.
    * Timestamps stay integer micros end-to-end (no double time math);
    * tie order within a user is pinned by (ts, event_id).
    *
    * Parameterized for the cross-formulation spec: Round9OpsSpec pins
    * this LAG+running-SUM formulation ≡ Spark's native session_window
    * gap-merge at the streaming family's 6 h gap — three formulations,
    * one contract, same discipline as the streaming trio's shared
    * oracle. Boundary semantics pinned AT exactly the gap: the break
    * predicate is strict `>`, i.e. an event landing exactly gapUs after
    * its predecessor MERGES into the session — matching session_window,
    * whose merge test is inclusive (next.start ≤ current.end with
    * end = ts + gap; adjudicated empirically by Round9OpsSpec's planted
    * exactly-gap case — a `>=` formulation would split there and
    * silently diverge from the native operator). */
  private[graft] def sessionSummary(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  val sessionize: Q = Q(
    "events_sessionize",
    (s, dir) => sessionSummary(graft.etl.Sources.events(s, dir), SessionGapUs)
      .orderBy("user_id", "session_idx"),
    Some(
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
         |g AS (
         |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
         |                   OR ts_us - lag(ts_us) OVER w > $SessionGapUs
         |            THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM g)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |       count(DISTINCT event_type) AS n_types,
         |       min(ts_us) AS start_us, max(ts_us) AS end_us,
         |       max(ts_us) - min(ts_us) AS dur_us
         |FROM sess GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin))

  /** Per-group Pearson correlation + OLS slope (quantity vs unit
    * revenue per part brand) — the grouped bivariate-statistics
    * operator a feature-engineering pass runs per category. Float
    * discipline: the five moment sums (Σx Σy Σxy Σx² Σy²) accumulate
    * EXACTLY in DECIMAL — order-independent, so partition order can't
    * flip bits — and the corr/slope formulas are evaluated once per
    * group over the exact sums cast to DOUBLE, an identical IEEE
    * expression tree in both engines (·, −, /, sqrt are all correctly
    * rounded). One broadcast dim join + one map-side-combining groupBy
    * to 25 rows: the 100 TB cost is a single scan. Degenerate groups
    * (zero variance in either coordinate) are filtered on the same
    * exact-sum predicate both sides rather than emitting NaN/Inf.
    *
    * Unit choice: both coordinates are INTEGER CENTS, sums in
    * DECIMAL(38,0) — scale-0 on purpose. A scale-k decimal above 2⁵³
    * casts to double in two roundings on DuckDB (int128→double, then
    * ÷10ᵏ) vs Java's one correct rounding — a measured 1-ulp corr
    * divergence at sf0.01. Integer-valued decimals convert in a single
    * correctly-rounded step on both engines, and corr/slope are
    * invariant under the common ×100. */
  val groupCorr: Q = Q(
    "olap_group_corr",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_partkey"),
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("x"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("y"))
      val p = table(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val sums = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
      val n = col("n_items").cast("double")
      val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
      val sxy = col("sxy").cast("double"); val sxx = col("sxx").cast("double")
      val syy = col("syy").cast("double")
      val covN = n * sxy - sx * sy
      val varX = n * sxx - sx * sx
      val varY = n * syy - sy * sy
      sums
        .filter(varX > 0.0 && varY > 0.0)
        .select(col("p_brand"), col("n_items"),
          (covN / sqrt(varX * varY)).as("corr_qty_price"),
          (covN / varX).as("slope_price_per_qty"))
        .orderBy("p_brand")
    },
    Some(
      """WITH c AS (
        |  SELECT l_partkey,
        |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |sums AS (
        |  SELECT p_brand, count(*) AS n_items,
        |         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
        |         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
        |         CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
        |         CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
        |         CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
        |  FROM c JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |d AS (
        |  SELECT p_brand, n_items,
        |         CAST(n_items AS DOUBLE) AS n,
        |         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |         CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
        |         CAST(syy AS DOUBLE) AS syy
        |  FROM sums)
        |SELECT p_brand, n_items,
        |       (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price,
        |       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_price_per_qty
        |FROM d
        |WHERE n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0
        |ORDER BY p_brand""".stripMargin))

  /** Analytic-window coverage suite — RANK / PERCENT_RANK / CUME_DIST /
    * NTILE / running FIRST_VALUE in one pass over one month of orders,
    * partitioned by priority. The ordering is made TOTAL by the
    * (price DESC, key) tie-break, so rank == row_number and every
    * rational window statistic is an exact small-integer division —
    * deterministic across engines. Money stays DECIMAL until the final
    * display cast; gap_to_best subtracts in DECIMAL (exact) before
    * casting. One month ≅ fixed-size partitions: at 100 TB the filter
    * prunes on the order-date partition column before the single
    * priority-keyed shuffle. */
  val rankSuite: Q = Q(
    "olap_rank_suite",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-03-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        .withColumn("rnk", rank().over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("gap_to_best",
          (first(col("price")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
            col("price")).cast("double"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("price").cast("double").as("o_totalprice"),
          col("rnk"), col("pct_rank"), col("cume"), col("quartile"),
          col("gap_to_best"))
        .orderBy("o_orderpriority", "rnk")
    },
    Some(
      """WITH m AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-03-01'
        |    AND o_orderdate < TIMESTAMP '1995-04-01')
        |SELECT o_orderkey, o_orderpriority,
        |       CAST(price AS DOUBLE) AS o_totalprice,
        |       rank() OVER w AS rnk,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume,
        |       ntile(4) OVER w AS quartile,
        |       CAST(first_value(price) OVER (PARTITION BY o_orderpriority
        |         ORDER BY price DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - price AS DOUBLE) AS gap_to_best
        |FROM m
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk""".stripMargin))

  /** Per-day EWMA of daily revenue with α = 1/2 — the decayed trailing
    * metric (monitoring, trend smoothing) WITHOUT sequential recursion:
    * ewma(t) ∝ Σ_k 2^(19−k)·cents(t−k) over the trailing 20 days, i.e.
    * the recursive definition unrolled to integer weights (truncation
    * error 2⁻²⁰ of the oldest term — below cent resolution). The fact
    * table folds to ≤|days| rows FIRST (map-side combine, exact cent
    * integers), so the ×20 day-offset expansion and the weighted
    * re-aggregation run on the tiny aggregate — at 100 TB the cost is
    * the one scan + one groupBy; the EWMA itself is O(days·20).
    * Calendar gaps renormalize: the weight denominator sums only the
    * weights of days actually present, same inner-join both engines.
    * All arithmetic is integer until one final double division. */
  /** Daily revenue in exact integer cents, keyed by day index from the
    * fixture epoch — the shared pre-aggregate [[ewmaRevenue]] and
    * [[seasonalAnomaly]] both fold the fact table onto (map-side
    * combine; ≤|days| rows out of the scan). */
  private def dailyCents(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("cents"))
      .select(datediff(col("d"), lit("1995-01-01").cast("date")).as("di"),
        col("cents"))

  val ewmaRevenue: Q = Q(
    "trend_ewma",
    (s, dir) => {
      val daily = dailyCents(s, dir)
      val wcol = pow(lit(2.0), lit(19) - col("k")).cast("long")
      val expd = daily
        .select(col("di"), col("cents"),
          explode(sequence(lit(0), lit(19))).as("k"))
        .select((col("di") + col("k")).as("td"),
          (col("cents") * wcol).as("wc"), wcol.as("w"))
      val agg = expd.groupBy(col("td"))
        .agg(sum(col("wc").cast("decimal(38,0)")).as("swc"),
          sum(col("w").cast("decimal(38,0)")).as("sw"))
      daily.join(agg, col("di") === col("td"))
        .select(col("di").as("day"),
          (col("cents").cast("double") / 100.0).as("revenue"),
          (col("swc").cast("double") / (col("sw").cast("double") * 100.0))
            .as("ewma20"))
        .orderBy("day")
    },
    Some(
      """WITH daily AS (
        |  SELECT datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS di,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |expd AS (
        |  SELECT di + k AS td,
        |         cents * CAST(pow(2, 19 - k) AS BIGINT) AS wc,
        |         CAST(pow(2, 19 - k) AS BIGINT) AS w
        |  FROM daily, (SELECT unnest(generate_series(0, 19)) AS k)),
        |agg AS (
        |  SELECT td, CAST(SUM(wc) AS DECIMAL(38,0)) AS swc,
        |         CAST(SUM(w) AS DECIMAL(38,0)) AS sw
        |  FROM expd GROUP BY td)
        |SELECT di AS day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(swc AS DOUBLE) / (CAST(sw AS DOUBLE) * 100.0) AS ewma20
        |FROM daily JOIN agg ON di = td
        |ORDER BY day""".stripMargin))

  /** Seasonally-adjusted robust anomaly screen over daily revenue —
    * [[anomalyMad]]'s calendar-aware sibling: a Saturday is judged
    * against the SATURDAY median, not the global one, so weekly
    * seasonality stops masking (or faking) anomalies. Two exact-median
    * passes (the [[groupMedian]] row_number-at-ceil(n/2) machinery)
    * per weekday bucket — value median, then MAD of the absolute
    * deviations — and the flag `dev > 3·MAD` compares INTEGER cents
    * end-to-end: no doubles anywhere but the display columns. Both
    * median windows partition by weekday over the ≤|days| daily
    * pre-aggregate ([[dailyCents]]), so at 100 TB the fact scan is the
    * cost and the screen itself is O(days·log days) on 7 bounded
    * partitions. */
  val seasonalAnomaly: Q = Q(
    "trend_seasonal_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = dailyCents(s, dir).withColumn("wd", col("di") % 7)
      val byV = Window.partitionBy(col("wd")).orderBy(col("cents"), col("di"))
      val byW = Window.partitionBy(col("wd"))
      val med = daily
        .withColumn("rn", row_number().over(byV))
        .withColumn("n", count(lit(1)).over(byW))
        .filter(col("rn") === ceil(col("n") / lit(2.0)))
        .select(col("wd"), col("cents").as("med_cents"))
      val dev = daily.join(broadcast(med), Seq("wd"))
        .withColumn("dev", abs(col("cents") - col("med_cents")))
      val byDev = Window.partitionBy(col("wd")).orderBy(col("dev"), col("di"))
      val mad = dev
        .withColumn("rn", row_number().over(byDev))
        .withColumn("n", count(lit(1)).over(byW))
        .filter(col("rn") === ceil(col("n") / lit(2.0)))
        .select(col("wd"), col("dev").as("mad_cents"))
      dev.join(broadcast(mad), Seq("wd"))
        .filter(col("dev") > lit(3L) * col("mad_cents"))
        .select(col("di").as("day"), col("wd"),
          (col("cents").cast("double") / 100.0).as("revenue"),
          (col("med_cents").cast("double") / 100.0).as("weekday_median"),
          (col("mad_cents").cast("double") / 100.0).as("weekday_mad"),
          (col("dev").cast("double") / 100.0).as("abs_dev"))
        .orderBy("day")
    },
    Some(
      """WITH daily AS (
        |  SELECT datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS di,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |d AS (SELECT di, cents, di % 7 AS wd FROM daily),
        |med AS (
        |  SELECT wd, cents AS med_cents FROM (
        |    SELECT wd, cents,
        |           row_number() OVER (PARTITION BY wd ORDER BY cents, di) AS rn,
        |           count(*) OVER (PARTITION BY wd) AS n
        |    FROM d) WHERE rn = ceiling(n / 2.0)),
        |dev AS (
        |  SELECT di, d.wd AS wd, cents, med_cents,
        |         abs(cents - med_cents) AS dev
        |  FROM d JOIN med ON d.wd = med.wd),
        |mad AS (
        |  SELECT wd, dev AS mad_cents FROM (
        |    SELECT wd, dev, di,
        |           row_number() OVER (PARTITION BY wd ORDER BY dev, di) AS rn,
        |           count(*) OVER (PARTITION BY wd) AS n
        |    FROM dev) WHERE rn = ceiling(n / 2.0))
        |SELECT di AS day, dev.wd AS wd,
        |       CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(med_cents AS DOUBLE) / 100.0 AS weekday_median,
        |       CAST(mad_cents AS DOUBLE) / 100.0 AS weekday_mad,
        |       CAST(dev AS DOUBLE) / 100.0 AS abs_dev
        |FROM dev JOIN mad ON dev.wd = mad.wd
        |WHERE dev > 3 * mad_cents
        |ORDER BY day""".stripMargin))

  /** Bucket count for [[gapHistogram]]: 2^22 s ≈ 48 days covers any
    * within-fixture gap; the ladder is generated, not hand-typed. */
  private val GapBuckets = 22

  /** Log₂-bucketed inter-event gap distribution per event stream — the
    * telemetry behind every temporal knob in this registry (the 8 h
    * session gap, the 1 h lateness allowance, the 6 h as-of staleness
    * tolerance are all read off this table): one LAG over the standard
    * user shuffle, then an integer threshold ladder (generated powers
    * of two — no libm log2, same reasoning as the Zipf curve) folds to
    * ≤[[GapBuckets]] rows. At 100 TB: one shuffle, 22-row output. */
  val gapHistogram: Q = Q(
    "events_gap_histogram",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val ladder = (0 until GapBuckets).foldRight(lit(GapBuckets.toLong)) {
        case (k, e) => when(col("gap_s") < (1L << (k + 1)), k.toLong).otherwise(e)
      }
      graft.etl.Sources.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        // `div`, not `/`: Spark's `/` on longs is DOUBLE division
        .withColumn("gap_s", expr("(ts_us - prev_us) div 1000000"))
        .filter(col("gap_s").isNotNull)
        .withColumn("bucket", ladder)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_s")).as("min_gap_s"), max(col("gap_s")).as("max_gap_s"))
        .orderBy("bucket")
    },
    Some {
      val ladder = (0 until GapBuckets)
        .map(k => s"WHEN gap_s < ${1L << (k + 1)} THEN $k").mkString(" ")
      s"""WITH g AS (
         |  SELECT (ts_us - lag(ts_us) OVER (
         |      PARTITION BY user_id ORDER BY ts_us, event_id)) // 1000000 AS gap_s
         |  FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events)),
         |b AS (SELECT gap_s, CASE $ladder ELSE $GapBuckets END AS bucket
         |      FROM g WHERE gap_s IS NOT NULL)
         |SELECT bucket, count(*) AS n_gaps,
         |       min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
         |FROM b GROUP BY bucket
         |ORDER BY bucket""".stripMargin
    })

  def all: Seq[Q] = Seq(
    trendByMonth, q1Agg, latestSnapshot, distinctTopSnapshots, snapshotLag,
    clientZoneTotals, propsJson, rollupFlagStatus, cubeTypeMonth,
    pivotStatusQty, trendMovingAvg, pathSeq, pathSeqCapped, churnCandidates,
    revenueShare,
    groupingSetsFlagStatus, q5LocalSupplierVolume, q3ShippingPriority,
    q10ReturnedItems, q8MarketShare, q17SmallQuantity, q4OrderPriority,
    trendYoy, q2MinCostSupplier, q6ForecastRevenue, q14PromoEffect,
    q19Disjunctive, retentionCohorts, rollingActive, skylineParts,
    markovTransitions, anomalyMad, groupMedian, groupMode, userFeatures,
    sessionize, groupCorr, rankSuite, ewmaRevenue, seasonalAnomaly,
    gapHistogram)
}
