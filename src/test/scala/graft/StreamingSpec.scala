package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.{SessionEvent, UserSession}

/** Streaming execution-path specs: the batch faces of these transforms
  * are oracle-checked by the driver; here the same code runs under the
  * streaming engine (MemoryStream micro-batches, state, file source). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600L * 1000000

  test("sessionsStreaming: state carries across micro-batches, gap closes sessions") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = EventStream.sessionsStreaming(input.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: two events 1h apart — same session, nothing closes
      input.addData(SessionEvent(7L, 0L), SessionEvent(7L, Hour))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0)
      // batch 2: an event 7h later (> 6h gap) closes the open session
      input.addData(SessionEvent(7L, 8L * Hour))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[UserSession].collect()
      assert(closed.toSeq == Seq(UserSession(7L, 0L, Hour, 2L)))
      // batch 3: another far event closes the second session
      input.addData(SessionEvent(7L, 16L * Hour))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 2)
    } finally q.stop()
  }

  test("asofStreaming: marker state carries across micro-batches") {
    import graft.streaming.EventStream.{AsofEnriched, TypedEvent}
    implicit val sc = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStream.asofStreaming(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: fact before any marker → empty carry; marker at equal
      // ts as a fact → counts for it (tie rule)
      input.addData(
        TypedEvent(1L, 7L, 100L, is_marker = false, 0.0),
        TypedEvent(2L, 7L, 200L, is_marker = true, 1.5),
        TypedEvent(3L, 7L, 200L, is_marker = false, 0.0))
      q.processAllAvailable()
      val b1 = spark.table("asof_out").as[AsofEnriched].collect()
        .sortBy(_.event_id)
      assert(b1.toSeq == Seq(
        AsofEnriched(1L, 7L, 100L, None, None),
        AsofEnriched(3L, 7L, 200L, Some(200L), Some(1.5))))
      // batch 2: the marker carried in state enriches later facts
      input.addData(TypedEvent(4L, 7L, 900L, is_marker = false, 0.0))
      q.processAllAvailable()
      val b2 = spark.table("asof_out").as[AsofEnriched].collect()
        .sortBy(_.event_id)
      assert(b2.last == AsofEnriched(4L, 7L, 900L, Some(200L), Some(1.5)))
      // batch 3: a LATE marker — older event-time than the carried one —
      // must NOT displace it (cross-batch carry is order-insensitive);
      // the next fact still sees the ts=200 marker
      input.addData(
        TypedEvent(5L, 7L, 150L, is_marker = true, 9.9),
        TypedEvent(6L, 7L, 950L, is_marker = false, 0.0))
      q.processAllAvailable()
      val b3 = spark.table("asof_out").as[AsofEnriched].collect()
        .sortBy(_.event_id)
      assert(b3.last == AsofEnriched(6L, 7L, 950L, Some(200L), Some(1.5)))
      // equal-ts, higher-id marker in a later batch DOES win (tie rule)
      input.addData(
        TypedEvent(8L, 7L, 200L, is_marker = true, 2.5),
        TypedEvent(9L, 7L, 960L, is_marker = false, 0.0))
      q.processAllAvailable()
      val b4 = spark.table("asof_out").as[AsofEnriched].collect()
        .sortBy(_.event_id)
      assert(b4.last == AsofEnriched(9L, 7L, 960L, Some(200L), Some(2.5)))
    } finally q.stop()
  }

  test("asofStreaming over the full event set matches the batch as-of query") {
    import graft.streaming.EventStream.{AsofEnriched, TypedEvent}
    implicit val sc = spark.sqlContext
    val all = graft.etl.Sources.events(spark, Sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "error").as("is_marker"), col("value"))
      .as[TypedEvent].collect()
    val input = MemoryStream[TypedEvent]
    val q = EventStream.asofStreaming(input.toDS())
      .writeStream.format("memory").queryName("asof_full_out")
      .outputMode("append").start()
    try {
      input.addData(all.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("asof_full_out").as[AsofEnriched].collect()
        .map(e => e.event_id -> ((e.last_mark_us, e.last_mark_value))).toMap
      val batch = Registry.queries("events_asof_lastmark")(spark, Sf)
        .collect()
        .map(r => r.getLong(0) -> ((
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
        .toMap
      assert(streamed.size == batch.size)
      batch.foreach { case (id, exp) =>
        assert(streamed(id) == exp, s"stream/batch as-of mismatch for event $id")
      }
    } finally q.stop()
  }

  test("session_window formulation honors the gap boundary contract (ts <= prev + gap merges)") {
    // the three sessionization formulations share one oracle whose
    // break predicate is ts - prev > gap: an event landing EXACTLY
    // gap after its predecessor belongs to the same session. The
    // harness events (random microsecond timestamps) never hit the
    // boundary, so this pins it explicitly for the session_window
    // formulation against the lag/running-sum one.
    val gapUs = EventStream.SessionGapUs
    val rows = Seq(
      (1L, 0L), (1L, gapUs),      // exactly gap -> one session
      (2L, 0L), (2L, gapUs + 1),  // one past gap -> two sessions
      (3L, 0L), (3L, gapUs - 1))  // inside gap  -> one session
    val df = rows.toDF("user_id", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val viaWindow = StreamingQueries.sessionWindowSessions(df)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLag = EventStream.sessionsBatch(
        df.select(col("user_id"), col("ts_us")).as[EventStream.SessionEvent])
      .toDF().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLag == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    assert(viaWindow == viaLag, s"session_window $viaWindow != lag $viaLag")
  }

  test("rangeJoinStreaming matches the batch range join's pair set") {
    implicit val sc = spark.sqlContext
    val winUs = TemporalJoinQueries.WindowUs
    // drive both event streams from the real event set (one batch);
    // compare the joined pair multiset against a batch computation of
    // the same interval predicate
    val raw = graft.etl.Sources.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
    val markers = raw.filter(col("event_type") === "error").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val facts = raw.filter(col("event_type") =!= "error").collect()
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getDouble(4)))
    val mIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val fIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = EventStream.rangeJoinStreaming(
      mIn.toDF().toDF("event_id", "user_id", "ts"),
      fIn.toDF().toDF("user_id", "ts", "value"), winUs)
      .writeStream.format("memory").queryName("range_out")
      .outputMode("append").start()
    try {
      mIn.addData(markers.toIndexedSeq)
      fIn.addData(facts.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("range_out")
        .groupBy(col("m_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = Registry.queries("events_range_burst")(spark, Sf)
        .filter(col("n_follow") > 0)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("native session_window sessionizes under the streaming engine") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDS().toDF("ts", "user_id")
    val sessions = events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${EventStream.SessionGapUs} microseconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    def t(h: Long) = new java.sql.Timestamp(h * 3600000)
    try {
      // 3 events inside one gap window, then one far beyond it: the
      // first session (3 events) finalizes once the watermark passes
      input.addData((t(0), 7L), (t(1), 7L), (t(2), 7L))
      q.processAllAvailable()
      input.addData((t(20), 7L))
      q.processAllAvailable()
      val out = spark.table("sw_out").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.toSeq == Seq((7L, 3L)))
    } finally q.stop()
  }

  test("windowedCounts over a streaming source matches the batch result") {
    // Stage the events parquet as a stream directory (one file = one batch)
    val dir = Files.createTempDirectory("events_stream")
    val batch = graft.etl.Sources.events(spark, Sf)
    batch.write.mode("overwrite").parquet(dir.toString)

    val streamed = EventStream.windowedCounts(
      spark.readStream
        .schema(batch.schema)
        .parquet(dir.toString))
    val q = streamed.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq)
      val want = EventStream.windowedCounts(batch)
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq)
      assert(got.length == want.length && got.sameElements(want))
    } finally q.stop()
  }

  test("codec tier composes with readStream: BMP decode stage matches batch") {
    // The real-decode stage is a pure typed mapPartitions
    // (MultimodalQueries.bmpStatsStage), so the identical code must run
    // over a file stream — stage the documents parquet as a 3-file
    // stream dir so multiple micro-batches exercise it.
    import spark.implicits._
    val dir = Files.createTempDirectory("docs_stream")
    val docs = graft.etl.Sources.table(spark, Sf, "documents")
    docs.repartition(3).write.mode("overwrite").parquet(dir.toString)
    // re-derive specs THROUGH the production projection so this pin
    // can't drift from the query's dims formula: the streaming frame
    // reuses media()'s column derivations by name
    def specsOf(df: org.apache.spark.sql.DataFrame) =
      MultimodalQueries.mediaSpecsOf(df.select(
        col("doc_id").as("media_id"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
        (lit(48) + (col("doc_id") % 5) * 24).cast("int").as("height")))
        .as[MultimodalQueries.MediaSpec]
    val streamed = MultimodalQueries.bmpStatsStage(specsOf(
      spark.readStream.schema(spark.read.parquet(dir.toString).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString)))
    val q = streamed.toDF().writeStream.format("memory").queryName("bmp_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("bmp_out").collect().map(_.toSeq).toSet
      val want = MultimodalQueries.bmpStatsStage(specsOf(docs.toDF()))
        .toDF().collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("windowedCounts watermark: windows finalize in append mode; late data is dropped") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDS().toDF("ts", "event_type", "value")
    val q = EventStream.windowedCounts(events)
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    def t(min: Long) = new java.sql.Timestamp(min * 60000)
    try {
      // two events in the [0:00,1:00) window
      input.addData((t(10), "click", 1.0), (t(20), "click", 2.0))
      q.processAllAvailable()
      // append mode holds the window open until the watermark passes
      assert(spark.table("wm_out").count() == 0)
      // an event 4h later advances the watermark (2h lag) past the window
      input.addData((t(240), "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("wm_out").collect()
      assert(closed.length == 1)
      assert(closed(0).getAs[String]("event_type") == "click")
      assert(closed(0).getAs[Long]("n_events") == 2L)
      // a late event for the finalized window is dropped, not re-emitted
      input.addData((t(30), "click", 9.0))
      q.processAllAvailable()
      assert(spark.table("wm_out").count() == 1)
    } finally q.stop()
  }

  test("dedupedIngest drops duplicate event ids across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDS().toDF("event_id", "ts")
    val q = EventStream.dedupedIngest(events)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(s: Long) = new java.sql.Timestamp(s * 1000)
      input.addData((1L, t(10)), (2L, t(11)))
      q.processAllAvailable()
      input.addData((2L, t(11)), (3L, t(12))) // 2 is a duplicate delivery
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("cdcStreaming: final state matches the batch CDC merge; late ops lose; tombstones persist") {
    import graft.streaming.EventStream.{CdcOp, CdcState}
    implicit val sc = spark.sqlContext

    // unit case: out-of-order delivery across micro-batches
    val input = MemoryStream[CdcOp]
    val q = EventStream.cdcStreaming(input.toDS())
      .writeStream.format("memory").queryName("cdc_unit_out")
      .outputMode("update").start()
    try {
      input.addData(CdcOp(1, 100, 10, is_delete = false, 1.0),
        CdcOp(2, 100, 11, is_delete = false, 2.0))
      q.processAllAvailable()
      // batch 2: user 1 gets a TOMBSTONE, user 2 gets a LATE (older) op
      input.addData(CdcOp(1, 200, 12, is_delete = true, 0.0),
        CdcOp(2, 50, 9, is_delete = false, 9.9))
      q.processAllAvailable()
      import spark.implicits._
      val fin = spark.table("cdc_unit_out").as[CdcState].collect()
        .groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_.n_ops) }
      // user 1: tombstone carried in state (key is dead)
      assert(fin(1L).is_delete && fin(1L).event_id == 12)
      // user 2: late op did NOT displace the newer value
      assert(!fin(2L).is_delete && fin(2L).event_id == 11 &&
        fin(2L).value == 2.0 && fin(2L).n_ops == 2)
    } finally q.stop()

    // full-set equivalence: live rows of the final state == cdc_merge_log
    val all = graft.etl.Sources.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), (col("event_type") === "error").as("is_delete"),
        col("value"))
      .as[CdcOp].collect()
    val input2 = MemoryStream[CdcOp]
    val q2 = EventStream.cdcStreaming(input2.toDS())
      .writeStream.format("memory").queryName("cdc_full_out")
      .outputMode("update").start()
    try {
      // split into two micro-batches to exercise cross-batch carry
      val (b1, b2) = all.partition(_.event_id % 2 == 0)
      input2.addData(b1.toIndexedSeq); q2.processAllAvailable()
      input2.addData(b2.toIndexedSeq); q2.processAllAvailable()
      val streamed = spark.table("cdc_full_out").as[CdcState].collect()
        .groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_.n_ops) }
        .filter(!_._2.is_delete)
        .map { case (u, s) => u -> ((s.ts_us, s.event_id, s.value, s.n_ops)) }
      val batch = Registry.queries("cdc_merge_log")(spark, Sf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(4), r.getLong(5))))
        .toMap
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("fileStream wrapper reads the raw nanos schema") {
    // fileStream targets the driver's raw events layout; point it at a
    // copy of the raw file (nanos timestamps) and check one micro-batch.
    val dir = Files.createTempDirectory("raw_events")
    Files.copy(
      java.nio.file.Path.of(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.fileStream(spark, dir.toString)
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("raw_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("raw_out").count() > 0)
    } finally q.stop()
  }

  test("goldenStreaming: fields update independently; final state matches the batch golden record") {
    import graft.streaming.EventStream.{FieldEvent, GoldenState}
    implicit val sc = spark.sqlContext
    import spark.implicits._

    // unit case: per-field independence + late-update rejection
    val input = MemoryStream[FieldEvent]
    val q = EventStream.goldenStreaming(input.toDS())
      .writeStream.format("memory").queryName("golden_unit_out")
      .outputMode("update").start()
    try {
      input.addData(FieldEvent(1, 100, 10, "view", 1.0),
        FieldEvent(1, 200, 11, "click", 2.0))
      q.processAllAvailable()
      // batch 2: a LATE view (loses), a newer click (wins), a signup (ignored)
      input.addData(FieldEvent(1, 50, 9, "view", 9.9),
        FieldEvent(1, 300, 12, "click", 3.0),
        FieldEvent(1, 400, 13, "signup", 7.0))
      q.processAllAvailable()
      val fin = spark.table("golden_unit_out").as[GoldenState].collect().last
      assert(fin.view.get.value == 1.0 && fin.view.get.ts_us == 100)
      assert(fin.click.get.value == 3.0 && fin.click.get.event_id == 12)
      assert(fin.purchase.isEmpty)
    } finally q.stop()

    // full-set equivalence vs the registered batch query, split across
    // micro-batches to exercise cross-batch carry
    val all = graft.etl.Sources.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[FieldEvent].collect()
    val input2 = MemoryStream[FieldEvent]
    val q2 = EventStream.goldenStreaming(input2.toDS())
      .writeStream.format("memory").queryName("golden_full_out")
      .outputMode("update").start()
    try {
      val (b1, b2) = all.partition(_.event_id % 2 == 0)
      input2.addData(b1.toIndexedSeq); q2.processAllAvailable()
      input2.addData(b2.toIndexedSeq); q2.processAllAvailable()
      // last emitted row per user = final state
      val streamed = spark.table("golden_full_out").as[GoldenState].collect()
        .zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
      val batch = Registry.queries("events_golden_record")(spark, Sf).collect()
      assert(streamed.size == batch.length)
      batch.foreach { r =>
        val s = streamed(r.getLong(0))
        def f(g: Option[graft.streaming.EventStream.GoldenField],
            vIdx: Int, tIdx: Int) = {
          assert(g.map(_.value) ==
            (if (r.isNullAt(vIdx)) None else Some(r.getDouble(vIdx))))
          assert(g.map(_.ts_us) ==
            (if (r.isNullAt(tIdx)) None else Some(r.getLong(tIdx))))
        }
        f(s.view, 1, 2); f(s.click, 3, 4); f(s.purchase, 5, 6)
        assert(Seq(s.view, s.click, s.purchase).count(_.isDefined) == r.getInt(7))
      }
    } finally q2.stop()
  }

  test("featuresStreaming: out-of-order micro-batches converge to the batch feature snapshot") {
    import graft.streaming.EventStream.{FieldEvent, FeatureState}
    implicit val sc = spark.sqlContext

    // the exact cutoffs the batch query parses (session tz is UTC here
    // as in the harness sessions)
    val Seq(snapUs, w7Us) = spark.range(1).select(
      unix_micros(to_timestamp(lit("2024-01-28 00:00:00"))),
      unix_micros(to_timestamp(lit("2024-01-21 00:00:00"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long])

    val all = graft.etl.Sources.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[FieldEvent].collect()

    val input = MemoryStream[FieldEvent]
    val q = EventStream.featuresStreaming(input.toDS(), snapUs, w7Us)
      .writeStream.format("memory").queryName("features_out")
      .outputMode("update").start()
    try {
      // two deliberately out-of-order micro-batches (odd ids first)
      val (b1, b2) = all.partition(_.event_id % 2 == 1)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val fin = spark.table("features_out").as[FeatureState].collect()
        .groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      val batch = Registry.queries("events_user_features")(spark, Sf).collect()
      assert(batch.nonEmpty && fin.size == batch.length)
      batch.foreach { r =>
        val s = fin(r.getAs[Long]("user_id"))
        assert(s.n_events == r.getAs[Long]("n_events"))
        assert(s.n_events_7d == r.getAs[Long]("n_events_7d"))
        assert(s.types.length.toLong == r.getAs[Long]("n_types"))
        assert(s.value_7d_cents / 100.0 == r.getAs[Double]("value_7d"),
          s"user ${s.user_id}: exact-cents sum must match the DECIMAL cast")
        assert((snapUs - s.last_ts_us) / 3600000000L ==
          r.getAs[Long]("hours_since_last"))
        assert(s.last_event_type == r.getAs[String]("last_event_type"))
      }
    } finally q.stop()
  }
}
