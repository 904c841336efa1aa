package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only job/stage counter for the iterative queries (not part of
  * the driver contract; invoked by hand while tuning). The r21 fold of
  * the eager-checkpoint job into the per-round convergence count is
  * invisible in the physical plan (the terminal plan is identical) —
  * its evidence is the DRIVER ACTION count per query, which this tool
  * measures: wall seconds, Spark job count, and completed-stage count
  * per named registry query, reps times each.
  *
  * Usage: ProfileJobs <query,query,...> [reps]; env as Bench
  * (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS). */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("graph_pagerank"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = e.stageInfo.taskMetrics
        if (m != null) taskMs.addAndGet(m.executorRunTime)
      }
    })
    // JIT/codegen warmup
    spark.range(2000000).selectExpr("sum(id)").collect()
    for (rep <- 1 to reps; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      catch { case _: java.util.concurrent.TimeoutException => () }
      val j0 = jobs.get(); val s0 = stages.get(); val m0 = taskMs.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      try org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      catch { case _: java.util.concurrent.TimeoutException => () }
      println(f"[jobs] $name rep$rep: ${secs}%.2f s  jobs=${jobs.get() - j0}  stages=${stages.get() - s0}  task_ms=${taskMs.get() - m0}")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
