package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only micro-profiler (test scope, never shipped): decomposes the
  * ETL load queries' bench time into PIPELINE cost (scan → clean →
  * broadcast-join → project, measured with a noop sink and no output
  * ordering) vs the ORACLE-DETERMINISM TAX (the persist + global
  * orderBy the hash-compare contract requires). Run with
  * `sbt 'Test/runMain graft.BenchTax'`; numbers land in PERF.md.
  */
object BenchTax {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect() // JVM warmup

    def time(fn: => DataFrame): Double = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      reps.sorted.apply(1) // median
    }

    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("cartera_load",
        () => pipelines.Cartera.load(spark, sfDir, Some("2024-06-01")),
        () => Registry.queries("cartera_load")(spark, sfDir)),
      ("pending_orders_load",
        () => pipelines.PendingOrders.load(spark, sfDir, Some("2024-06-01")),
        () => Registry.queries("pending_orders_load")(spark, sfDir)))
    cases.foreach { case (name, pipeline, full) =>
      val p = time(pipeline())
      val f = time(full())
      println(f"[benchtax] $name pipeline=$p%.2f full=$f%.2f tax=${f - p}%.2f (${(f - p) / f * 100}%.0f%%)")
    }
    spark.stop()
  }
}
