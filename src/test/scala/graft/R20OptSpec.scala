package graft

import org.apache.spark.sql.functions._

/** Pins for the round-20 optimization internals.
  *
  * O1 — Sources.scatter: the scale-adaptive scan scatter must
  * repartition a single-split scan to the session parallelism and be
  * an exact no-op (same plan object, no added exchange) when the
  * input is already split at least half as wide as the session.
  *
  * O2 — the localCheckpoint lineage cut must (a) preserve the
  * rows/schema it cuts and (b) leave the LogicalRDD leaf with an
  * HONEST (small) size estimate instead of the defaultSizeInBytes
  * sentinel, so the per-round graph-loop joins stay size-driven and
  * the small side broadcasts (the r20 SMJ→BHJ plan flips). The
  * checkpoint does NOT preserve outputPartitioning under AQE — a
  * same-key aggregate above the cut still plans its exchange; that
  * negative result is pinned in the test body so no future round
  * builds on the disproven partitioning-preservation claim. */
class R20OptSpec extends SparkSpec {

  test("scatter decision: fires only when the scan is under-split vs the session") {
    import graft.etl.Sources.needScatter
    assert(needScatter(parts = 1, want = 32))      // the bench SF case
    assert(needScatter(parts = 15, want = 32))
    assert(!needScatter(parts = 16, want = 32))    // half-wide scan: leave it
    assert(!needScatter(parts = 2000, want = 32))  // cluster scale: no-op
    assert(!needScatter(parts = 1, want = 2))      // tiny session: not worth it
  }

  test("scatter: rows survive and land at session parallelism when fired") {
    // local[2] sessions never fire the rule (1*2 >= 2), so exercise the
    // repartition arm directly the way a 32-core session would reach it
    val df = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val scattered = df.repartition(
      spark.sparkContext.defaultParallelism, col("o_orderkey"))
    assert(scattered.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(scattered.count() == df.count())
    assert(scattered.join(df, Seq("o_orderkey"), "left_anti").isEmpty)
  }

  test("scatter: already-split input comes back untouched (no-op at scale)") {
    val wide = spark.range(0, 1000, 1,
      spark.sparkContext.defaultParallelism).toDF("k")
    val out = graft.etl.Sources.scatter(spark, wide, col("k"))
    assert(out eq wide) // the exact no-op branch, not a re-plan
  }

  test("localCheckpoint cut preserves rows and carries usable size stats (join strategy stays size-driven)") {
    val base = spark.range(0, 1000).select(
      (col("id") % 37).as("src"), col("id").as("v"))
    val cut = base.repartition(4, col("src")).localCheckpoint(true)
    // (a) rows survive the cut
    assert(cut.count() == 1000)
    // (b) the LogicalRDD leaf carries a real (small) size estimate,
    // not the defaultSizeInBytes sentinel — this is what lets the
    // planner broadcast the small side of the per-round graph-loop
    // joins (the r20 plan flips SMJ -> BHJ in plans/r20/*_after.txt)
    val stats = cut.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 &&
      stats < spark.sessionState.conf.autoBroadcastJoinThreshold * 64, s"stats=$stats")
    val big = spark.range(0, 200000).select(
      (col("id") % 37).as("src"), col("id").as("w"))
    val joined = big.join(cut.groupBy(col("src")).agg(sum(col("v")).as("sv")), Seq("src"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // NOTE (measured here, kept as a pin): the checkpoint does NOT
    // preserve outputPartitioning under AQE — a same-key aggregate
    // above the cut still plans its exchange. The r20 win is the
    // InternalRow store + honest stats, not partitioning reuse.
    val agg = cut.groupBy(col("src")).agg(sum(col("v")))
    assert(agg.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
  }
}
