package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** The round-3 scale knobs: parameter derivations that replace the
  * constants the round-2 audit flagged as O(n) hazards (fixed LSH plane
  * count, linear IVF centroids, fixed packing shards, uncapped shingle
  * df), plus the window-based sessionization that replaced the
  * materialize-the-whole-user batch path. */
class ScaleKnobsSpec extends SparkSpec {

  test("lshPlanes: 8 at the verification scale, grows ~log2(n), clamped") {
    // The sim_ann_lsh oracle pins planes=8 — this is the load-bearing
    // equality that keeps the static SQL honest at sf0.01 (n=500).
    assert(SimilarityQueries.lshPlanes(500) == 8)
    assert(SimilarityQueries.lshPlanes(2000) == 10) // sf0.1
    assert(SimilarityQueries.lshPlanes(1) == 4) // floor clamp
    assert(SimilarityQueries.lshPlanes(1L << 60) == 48) // ceiling clamp
    // monotone non-decreasing across decades: bucket occupancy never
    // regresses as the corpus grows
    val decades = Seq(100L, 1000L, 10000L, 100000L, 1000000L, 10000000L)
    decades.sliding(2).foreach { case Seq(a, b) =>
      assert(SimilarityQueries.lshPlanes(a) <= SimilarityQueries.lshPlanes(b))
    }
    // +1 plane per 2x corpus => expected bucket size stays ~constant
    assert(SimilarityQueries.lshPlanes(1 << 20) ==
      SimilarityQueries.lshPlanes(1 << 19) + 1)
    // exact-power boundaries: n/target a power of two is where a float
    // log2 lands a ulp on either side of the whole number (and the
    // oracle's LOG2 may land on the other) — the integer derivation is
    // exact: 2^k >= n/2 with equality stays at k
    assert(SimilarityQueries.lshPlanes(512) == 8)
    assert(SimilarityQueries.lshPlanes(513) == 9)
    assert(SimilarityQueries.lshPlanes(1L << 30) == 29)
  }

  test("ivfStride/ivfNProbe: K ~ sqrt(n), scanned fraction ~ constant") {
    assert(SimilarityQueries.ivfStride(500) == 22)
    assert(SimilarityQueries.ivfStride(1000000) == 1000)
    // centroid count at the spec scale: ids = 3 mod 22 in [0, 500) -> 23
    assert(SimilarityQueries.ivfNProbe(23) == 3)
    assert(SimilarityQueries.ivfNProbe(8) == 2) // floor
    // at 100x the corpus, K grows 10x and nProbe follows: the fraction
    // of the corpus each query scans (nProbe/K) stays ~1/8
    val k1 = 1000000L / SimilarityQueries.ivfStride(1000000)
    val frac = SimilarityQueries.ivfNProbe(k1).toDouble / k1
    assert(frac > 0.1 && frac < 0.15, s"scan fraction $frac")
  }

  test("packShards: 8 at the verification scale, grows with input") {
    assert(PackQueries.packShards(500) == 8)
    assert(PackQueries.packShards(1) == 1)
    assert(PackQueries.packShards(5000) == 79) // sf0.1
    // shard count is linear in n: per-shard work (the sequential cumsum)
    // stays bounded instead of growing with the corpus
    assert(PackQueries.packShards(1000000) >= 15000)
  }

  test("shingle df-cap bounds candidate pairs under planted boilerplate") {
    import spark.implicits._
    // 200 docs sharing one boilerplate sentence (df=200 > cap=128), each
    // with a unique tail: uncapped, the boilerplate shingles alone
    // contribute ~200^2/2 candidate pairs; capped, zero pairs survive.
    val boiler = "subscribe to our newsletter for updates and exclusive offers today"
    val docs = (0 until 200)
      .map(i => (i.toLong, s"$boiler unique tail $i alpha$i beta$i gamma$i"))
      .toDF("doc_id", "text")
    def pairs(ex: org.apache.spark.sql.DataFrame): Long =
      ex.toDF("i", "h").join(ex.toDF("j", "h"), Seq("h"))
        .filter(col("i") < col("j"))
        .select("i", "j").distinct().count()
    val uncapped = pairs(DedupQueries.rawShingleIndexOf(docs))
    val capped = pairs(DedupQueries.shingleIndexOf(docs))
    assert(uncapped >= 200L * 199 / 2, s"uncapped=$uncapped")
    assert(capped == 0, s"capped=$capped")
    // and the report surfaces what was dropped (no silent caps): the
    // boilerplate's shingles all have df=200
    val dropped = DedupQueries.rawShingleIndexOf(docs)
      .groupBy("h").count().filter(col("count") > DedupQueries.ShingleDfCap)
      .count()
    assert(dropped > 0)
  }

  test("sessionsBatch: windowed formulation survives a heavy user") {
    import spark.implicits._
    // one user, 100k events 1ms apart, then a post-gap burst of 3:
    // the flatMapGroups formulation materialized all 100k timestamps in
    // one task's heap; the window formulation sorts/spills instead.
    val gap = EventStream.SessionGapUs
    val dense = spark.range(100000)
      .select(lit(7L).as("user_id"), (col("id") * 1000L).as("ts_us"))
    val burst = spark.range(3)
      .select(lit(7L).as("user_id"),
        (lit(100000L * 1000 + gap + 1) + col("id")).as("ts_us"))
    val sessions = EventStream
      .sessionsBatch(dense.unionAll(burst).as[EventStream.SessionEvent])
      .collect().sortBy(_.session_start_us)
    assert(sessions.length == 2)
    assert(sessions(0).n_events == 100000)
    assert(sessions(0).session_start_us == 0)
    assert(sessions(0).session_end_us == 99999L * 1000)
    assert(sessions(1).n_events == 3)
  }

  test("quality keep-hist == percent_rank window on adversarial source sizes") {
    // sf fixtures have uniform source sizes; this drives the histogram
    // formulation over sizes the boundary arithmetic must get right:
    // n=1 (percent_rank pins keep=false), n=2..4 (r* lands on bin
    // edges), one big source with heavy q ties (boundary bin filled
    // with equal scores, tie-broken by doc_id)
    import org.apache.spark.sql.expressions.Window
    val rows = Seq(
      (0L, "solo", "alpha beta gamma")) ++
      (1L to 2L).map(i => (i, "pair", s"word$i " * 5)) ++
      (10L to 13L).map(i => (i, "quad", ("the quick fox " * (i - 8).toInt))) ++
      (100L to 199L).map(i => (i, "big",
        if (i % 3 == 0) "tie tie tie tie" else s"doc $i " * ((i % 7) + 1).toInt))
    val dir = java.nio.file.Files.createTempDirectory("keephist").toString
    import spark.implicits._
    rows.toDF("doc_id", "src", "txt").select(col("doc_id"),
      col("txt").as("text"), lit("en").as("lang"), col("src").as("source"),
      length(col("txt")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.queries("text_quality_keep_hist")(spark, dir)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val w = Window.partitionBy(col("source")).orderBy(col("q"), col("doc_id"))
    val want = Registry.queries("text_quality_score")(spark, dir)
      .select(col("doc_id"), col("quality_score").as("q"))
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source")), "doc_id")
      .withColumn("keep", percent_rank().over(w) >= 0.7)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got == want)
    assert(!got(0L)) // the lone-row source is never kept
    spark.catalog.clearCache()
  }

  test("pathPrefix: a 10k-event user yields a capped, marked prefix") {
    // one bot user with 10^4 events and one normal user: the capped
    // path operator must emit a bounded prefix (the collect_list
    // buffer never sees rows past the cap) and flag the truncation
    val heavy = spark.range(10000)
      .select(lit(1L).as("user_id"), (col("id") * 1000L).as("ts_us"),
        col("id").as("event_id"),
        concat(lit("t"), col("id") % 3).as("event_type"))
    val light = spark.range(5)
      .select(lit(2L).as("user_id"), (col("id") * 1000L).as("ts_us"),
        (col("id") + 20000L).as("event_id"),
        lit("view").as("event_type"))
    val out = AnalysisQueries
      .pathPrefix(heavy.unionAll(light), AnalysisQueries.PathSeqCap)
      .orderBy("user_id").collect()
    assert(out.length == 2)
    val bot = out(0)
    assert(bot.getAs[Long]("n_events") == 10000L)
    assert(bot.getAs[Boolean]("truncated"))
    val steps = bot.getAs[String]("path_prefix").split("->")
    assert(steps.length == AnalysisQueries.PathSeqCap)
    // the prefix is the FIRST cap events in (ts, id) order
    assert(steps.head == "t0" && steps(1) == "t1" && steps(2) == "t2")
    val normal = out(1)
    assert(normal.getAs[Long]("n_events") == 5L)
    assert(!normal.getAs[Boolean]("truncated"))
    assert(normal.getAs[String]("path_prefix") ==
      "view->view->view->view->view")
  }
}
