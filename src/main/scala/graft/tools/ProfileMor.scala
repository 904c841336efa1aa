package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only MOR deletion-vector A/B (round-10 verdict task 2): the SAME
  * merge-on-read scan driven two ways under a FORCED heavy-delete
  * fixture —
  *
  *   broadcast — the r10 shape: (file_id, word, bits) DV table
  *               broadcast, fact probes it with a broadcast hash join.
  *               Bounded only when churn is bounded: the DV table is
  *               ~n_deletes/64 longs TOTAL, so percent-level deletes at
  *               100 TB make it tens of GB — undistributable.
  *   shuffle   — the r11 shape shipped in `layout_mor_scan`: DV words
  *               folded to one map per file, both sides hash-partitioned
  *               on file_id (SHUFFLE_HASH hint), per-row map probe.
  *               The DV side is distributed; nothing is ever collected
  *               to one place.
  *
  * Fixture: orders replicated 10× (~15M rows at sf0.1) with a 50%
  * delete predicate — the churn regime MOR exists for, where the
  * broadcast bound genuinely breaks. Both variants must produce the
  * identical live aggregate (asserted) — the A/B is purely plan shape +
  * time. AQE is OFF so the static join choice is what actually runs
  * (AQE would re-broadcast the small side at this fixture scale and
  * measure the adaptive plan, not the two shapes under test).
  *
  * Not part of the driver contract; run by hand
  * (`sbt 'runMain graft.tools.ProfileMor'`), numbers land in PERF.md,
  * guidance in SketchQueries.morScan's scaladoc. */
object ProfileMor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()

    // 10× replicated orders, re-keyed so every replica holds distinct
    // positions; 50% of rows deleted (key % 2) — heavy churn.
    def fact: DataFrame = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("rep", explode(sequence(lit(0), lit(9))))
      .select(
        (col("o_orderkey") * 10 + col("rep")).as("k"),
        col("o_totalprice"), col("o_orderpriority"))
      .select(
        expr("k div 4096").as("file_id"), (col("k") % 4096).as("pos"),
        col("k"), col("o_totalprice"), col("o_orderpriority"))

    def dvWords(o: DataFrame): DataFrame = o
      .filter(col("k") % 2 === 0)
      .select(col("file_id"), expr("pos div 64").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy(col("file_id"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))

    def agg(live: DataFrame): DataFrame = live
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("live_revenue"))

    def variantBroadcast(): DataFrame = {
      val o = fact
      agg(o.withColumn("word", expr("pos div 64"))
        .join(broadcast(dvWords(o)), Seq("file_id", "word"), "left")
        .filter(col("bits").isNull ||
          expr("(shiftright(bits, CAST(pos % 64 AS INT)) & 1) = 0")))
    }

    def variantShuffle(): DataFrame = {
      val o = fact
      val dv = dvWords(o)
        .groupBy(col("file_id"))
        .agg(map_from_entries(collect_list(struct(col("word"), col("bits"))))
          .as("dv"))
      agg(o.join(dv.hint("shuffle_hash"), Seq("file_id"), "left")
        .filter(col("dv").isNull ||
          expr("coalesce((shiftright(element_at(dv, pos div 64), CAST(pos % 64 AS INT)) & 1) = 0, true)")))
    }

    // correctness first: both variants and the plain predicate agree
    val expected = fact.filter(col("k") % 2 =!= 0)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_live"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((label, v) <- Seq("broadcast" -> variantBroadcast _,
                           "shuffle" -> variantShuffle _)) {
      val got = v().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(got == expected, s"$label disagrees: $got vs $expected")
    }

    val reps = 3
    for ((label, v) <- Seq("broadcast" -> variantBroadcast _,
                           "shuffle" -> variantShuffle _)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        v().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.gc()
      println(f"[mor-ab] $label%-10s median=${times.sorted.apply(reps / 2)}%.2f s  " +
        f"(min=${times.min}%.2f max=${times.max}%.2f)")
    }
    // plan shape: the shipped form must NOT statically broadcast the DV
    val plan = variantShuffle().queryExecution.sparkPlan.toString
    println(s"[mor-ab] shuffle variant join nodes: " +
      plan.linesIterator.filter(_.contains("Join")).mkString(" | "))
    spark.stop()
  }
}
