package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only in-sweep variance decomposition (round-10 verdict task 3).
  * The r10 spread data showed 3-10x same-build rep spreads on
  * adjudicated queries (dq_profile 0.61-6.02 s in one sweep, isolated
  * 1.0-1.17 s) — this isolates WHY by timing one adjudicated target in
  * three contexts, `reps` times each:
  *
  *   isolated     — target alone (the clean-run baseline)
  *   after-heavy  — each rep immediately preceded by an UNTIMED run of
  *                  the heaviest sweep query (dedup_prefix_filter),
  *                  with no System.gc between — the worst-case sweep
  *                  neighborhood
  *   heavy+gc     — same, but clearCache + System.gc after the heavy
  *                  neighbor, i.e. exactly what Bench does between
  *                  queries
  *
  * Per rep it records wall time AND the stop-the-world GC milliseconds
  * inside the timed region. Readings: after-heavy >> isolated with
  * GC-heavy reps = the neighbor's debris taxes the target (and the
  * between-query gc matters); heavy+gc ~= isolated = Bench's hygiene
  * is sufficient and the residual sweep variance is scheduling/JIT
  * noise that per-pass order randomization averages out.
  *
  * Not part of the driver contract; run by hand
  * (`sbt 'runMain graft.tools.ProfileVariance'`), numbers land in
  * PERF.md. */
object ProfileVariance {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val target = sys.env.getOrElse("SPARK_GRAFT_VAR_TARGET", "dq_profile")
    val heavy = sys.env.getOrElse("SPARK_GRAFT_VAR_HEAVY", "dedup_prefix_filter")
    val reps = sys.env.getOrElse("SPARK_GRAFT_VAR_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()

    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // both queries warmed once so JIT/codegen first-run cost is off the books
    run(target); spark.catalog.clearCache()
    run(heavy); spark.catalog.clearCache()
    System.gc()

    def contextRun(label: String, before: () => Unit): Unit = {
      val rows = (1 to reps).map { _ =>
        before()
        val gc0 = gcMillis(); val t0 = System.nanoTime()
        run(target)
        val dt = (System.nanoTime() - t0) / 1e9
        val gc = gcMillis() - gc0
        spark.catalog.clearCache()
        (dt, gc)
      }
      val ts = rows.map(_._1).sorted
      println(f"[var] $label%-12s median=${ts(reps / 2)}%.2f s  min=${ts.head}%.2f  " +
        f"max=${ts.last}%.2f  gc_ms=${rows.map(_._2).mkString(",")}")
    }

    contextRun("isolated", () => { System.gc() })
    contextRun("after-heavy", () => { run(heavy); spark.catalog.clearCache() })
    contextRun("heavy+gc", () => { run(heavy); spark.catalog.clearCache(); System.gc() })
    spark.stop()
  }
}
