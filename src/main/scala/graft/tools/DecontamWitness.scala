package graft.tools

import org.apache.spark.sql.SparkSession

/** Fixed-eval-set decontamination scaling witness (r18, adjudicating
  * the decade3_ext94 `curate_decontaminate` flag) — a dev-only
  * measurement main, NOT a registry query.
  *
  * The registry query's fixture scales the EVAL set with the corpus
  * (doc_id%41 = 0 of whatever SF is under test), so a 10x corpus grows
  * BOTH sides of the shingle h-join 10x and the intersect-pair
  * aggregate can grow up to 100x — the measured sf1→sf10 ratio ~20x
  * measures the fixture, not the plan. Production decontamination has
  * a FIXED benchmark suite at any training scale (the scaladoc's own
  * 100 TB claim). This main pins the eval set to doc_id < benchMax
  * (gen_sf10's document stream is a seed-identical prefix extension of
  * sf1's, so the same cap selects the IDENTICAL eval docs at both SFs)
  * and times the registry-identical pipeline
  * (DedupQueries.decontaminatePipeline) at both decades; the expected
  * fixed-eval ratio is ~linear in the train side.
  *
  * Run: sbt 'runMain graft.tools.DecontamWitness' — env knobs:
  * SPARK_GRAFT_DCW_SMALL / _LARGE (default target/sf1, target/sf10),
  * SPARK_GRAFT_DCW_BENCH_MAX (default 50000 = sf1 |documents|),
  * SPARK_GRAFT_DCW_REPS (default 3). Prints one JSON line shaped for
  * SCALING.json's `decontam_fixed_eval` block. */
object DecontamWitness {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.ui.enabled", "false")
    val spark = graft.Bench.localDir().fold(b0)(d => b0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()

    val small = sys.env.getOrElse("SPARK_GRAFT_DCW_SMALL", "target/sf1")
    val large = sys.env.getOrElse("SPARK_GRAFT_DCW_LARGE", "target/sf10")
    val benchMax = sys.env.getOrElse("SPARK_GRAFT_DCW_BENCH_MAX", "50000").toLong
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_DCW_REPS", "3").toInt)

    def run(dir: String): (Double, Long) = {
      var rows = -1L
      val times = (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        val df = graft.DedupQueries.decontaminatePipeline(
          spark, dir, Some(benchMax))
        val obs = new org.apache.spark.sql.Observation(s"dcw_${dir}_$rep")
        df.observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows"))
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (rows < 0) rows = obs.get("rows").asInstanceOf[Long]
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      (times.sorted.apply((times.size - 1) / 2), rows)
    }
    // Untimed JIT/codegen warmup on the small side (Bench discipline).
    graft.DedupQueries.decontaminatePipeline(spark, small, Some(benchMax))
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    val (tS, rS) = run(small)
    val (tL, rL) = run(large)
    val ratio = if (tS > 0) tL / tS else -1.0
    println(
      f"""{"block":"decontam_fixed_eval","bench_max":$benchMax,"reps":$reps,""" +
      f""""small":{"dir":"$small","sec":$tS%.3f,"rows":$rS},""" +
      f""""large":{"dir":"$large","sec":$tL%.3f,"rows":$rL},""" +
      f""""ratio":$ratio%.2f}""")
    spark.stop()
  }
}
