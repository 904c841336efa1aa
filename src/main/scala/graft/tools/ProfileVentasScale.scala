package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipelines.VentasTotales

/** Dev-only decade-2 adjudication for the ventas pair (r13): the second
  * scaling decade flagged `ventas_incremental` / `ventas_rerun_zero`
  * superlinear (13-16x on 10x data; 34x under production row groups),
  * while `ventas_dq_nonnumeric*` — the SAME prepared subtree minus the
  * anti-join — scaled at 2-3x. The superlinear term is therefore the
  * dedup stage, not the join tree. This times the two candidate
  * shapes for that stage end-to-end at an arbitrary SF dir:
  *
  *   window    — shipped `antiJoinSelfNormalized`: one derivation, but
  *               the window shuffles+sorts the FULL-WIDTH rows on the
  *               key tuple
  *   two-pass  — `loadAntiJoin`/`rerunAntiJoin`: the incoming subtree
  *               derives twice, but the existing side prunes to the 4
  *               normalized key columns before its shuffle and the
  *               anti-join carries keys, not payloads
  *
  * SPARK_GRAFT_SF_DIR picks the data, SPARK_GRAFT_AB_REPS the reps
  * (default 2, median = min of 2). Not part of the driver contract. */
object ProfileVentasScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/rgtest/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      println(f"[ventas-scale] $label: median ${ts.sorted.apply((ts.size - 1) / 2)}%.2f s " +
        s"(runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // Row-count sanity: both shapes must agree before timing.
    val nWindow = VentasTotales.rerun(spark, sfDir).count()
    val nTwoPass = VentasTotales.rerunAntiJoin(spark, sfDir).count()
    require(nWindow == nTwoPass, s"shape mismatch: window=$nWindow twoPass=$nTwoPass")
    val nW2 = VentasTotales.load(spark, sfDir).count()
    val nT2 = VentasTotales.loadAntiJoin(spark, sfDir).count()
    require(nW2 == nT2, s"load shape mismatch: window=$nW2 twoPass=$nT2")
    println(s"[ventas-scale] $sfDir rerun rows=$nWindow load rows=$nW2")

    timed("rerun window  (shipped)") { sink(VentasTotales.rerun(spark, sfDir)) }
    timed("rerun twopass          ") { sink(VentasTotales.rerunAntiJoin(spark, sfDir)) }
    timed("load  window  (shipped)") { sink(VentasTotales.load(spark, sfDir)) }
    timed("load  twopass          ") { sink(VentasTotales.loadAntiJoin(spark, sfDir)) }

    spark.stop()
  }
}
