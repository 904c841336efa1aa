package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only measurement for `dq_profile_wide`'s two standing claims
  * (r12 verdict tasks 2 and 6); numbers land in PERF.md.
  *
  * Part 1 — staged decomposition of the r11 fix (the "25.3 s →
  * 2.75 s" citation at DqQueries wideProfileFrame): the two "before"
  * stages are reconstructed through the builder's `scatter`/`legacyHv`
  * knobs, so each stage is the production plan minus exactly one fix:
  *
  *   stage0  legacy hv (12 instr/substr probes/entry), no scatter
  *   stage1  legacy hv, scattered source rows
  *   stage2  conv() hv, scattered            (the shipped form)
  *
  * Part 2 — per-column marginal cost for the linear-in-columns claim:
  * profile synthetic wide tables (written to parquet first — the claim
  * is about the one-SCAN shape) at P = 11/33/55 columns and report the
  * marginal seconds/column between the endpoints. Linear-in-columns
  * shows as t(P) ≈ t_fixed + P·m with the same m across spans.
  *
  * Run: `sbt 'runMain graft.tools.ProfileWide'` (sf via
  * SPARK_GRAFT_SF_DIR, default sf0.1; reps via SPARK_GRAFT_WIDE_REPS,
  * default 3; medians reported). */
object ProfileWide {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_WIDE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()
    val par = spark.sparkContext.defaultParallelism

    def medianOf(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      val med = ts.sorted.apply((ts.size - 1) / 2)
      println(f"[wide] $label%-28s median=$med%.2f s  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      med
    }

    val lineitem = graft.etl.Sources.table(spark, sfDir, "lineitem")

    import graft.DqQueries.{wideProfileFrame, WideCols, syntheticWide}
    if (!sys.env.contains("SPARK_GRAFT_WIDE_SKIP_STAGED")) {
      println(s"== Part 1: staged fix decomposition (11 registry columns, $sfDir) ==")
      val s0 = medianOf("stage0 legacyHv+noscatter")(
        wideProfileFrame(lineitem, WideCols, par, scatter = false, legacyHv = true))
      val s1 = medianOf("stage1 legacyHv+scatter")(
        wideProfileFrame(lineitem, WideCols, par, scatter = true, legacyHv = true))
      val s2 = medianOf("stage2 shipped")(
        wideProfileFrame(lineitem, WideCols, par, scatter = true, legacyHv = false))
      println(f"[wide] staged: $s0%.2f -> $s1%.2f -> $s2%.2f s")
    }

    println(s"== Part 2: per-column marginal cost (synthetic wide parquet) ==")
    val pointList = sys.env.getOrElse("SPARK_GRAFT_WIDE_POINTS", "11,33,55")
      .split(',').map(_.trim.toInt).toSeq
    val points = pointList.map { p =>
      val (wide, wcols) = syntheticWide(lineitem, p)
      val out = s"target/widecols/p$p"
      wide.write.mode("overwrite").parquet(out)
      if (sys.env.contains("SPARK_GRAFT_WIDE_EXPLAIN")) {
        val plan = wideProfileFrame(spark.read.parquet(out), wcols, par)
          .queryExecution.executedPlan.toString
        val spans = "\\*\\(\\d+\\)".r.findAllIn(plan).toSeq.distinct
        println(s"[wide] P=$p codegen spans=${spans.size} " +
          s"generateCodegen=${plan.contains("Generate explode") && spans.nonEmpty}")
        println(plan.linesIterator.filter(l =>
          l.contains("Generate") || l.contains("WholeStageCodegen") ||
          l.contains("HashAggregate") || l.contains("Project") ||
          l.contains("Exchange") || l.contains("Scan parquet"))
          .map(l => "[wide]   " + l.take(160)).mkString("\n"))
      }
      val t = medianOf(s"P=$p")(
        wideProfileFrame(spark.read.parquet(out), wcols, par))
      (p, t)
    }
    for (Seq((pa, ta), (pb, tb)) <- points.sliding(2))
      println(f"[wide] marginal $pa->$pb: ${(tb - ta) / (pb - pa)}%.3f s/col")
    val (p0, t0) = points.head; val (pn, tn) = points.last
    println(f"[wide] marginal $p0->$pn (endpoints): ${(tn - t0) / (pn - p0)}%.3f s/col")
    spark.stop()
  }
}
