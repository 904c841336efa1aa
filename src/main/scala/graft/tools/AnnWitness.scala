package graft.tools

import org.apache.spark.sql.SparkSession

/** Fixed-query-stream ANN scaling witness (r15 verdict task 5) — a
  * dev-only measurement main, NOT a registry query.
  *
  * sim_ann_ivf's decade ratio is dominated by its documented workload
  * model: the probe set is every 50th vector, so queries GROW 10x per
  * decade while each query scans a fixed 1/8 corpus fraction — scored
  * pairs grow 100x. The 100 TB claim "per-QUERY cost is linear in n"
  * was asserted from that arithmetic; this main MEASURES it by pinning
  * |Q| to the sf1 query stream at both decades. gen_sf10's embeddings
  * are a strict prefix-extension of sf1's (same seed, row-major numpy
  * generation), so `qCap = 20000` (sf1's vector-space size) selects the
  * IDENTICAL 400 query vectors at sf1 and sf10 — the serving-workload
  * shape — and the measured ratio isolates per-query growth: index
  * build (n·K assignment) is linear in n, each probe's candidate list
  * is nprobe·(n/K) ≈ n/8 rows, so the expected fixed-|Q| decade ratio
  * is ~10 (linear), vs ~100 for the grow-with-corpus stream.
  *
  * Run: sbt 'runMain graft.tools.AnnWitness' — env knobs:
  * SPARK_GRAFT_ANNW_SMALL / _LARGE (default target/sf1, target/sf10),
  * SPARK_GRAFT_ANNW_QCAP (default 20000 = sf1 |V|),
  * SPARK_GRAFT_ANNW_REPS (default 3). Prints one JSON line shaped for
  * SCALING.json's `ann_fixed_q` block. */
object AnnWitness {
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

    val small = sys.env.getOrElse("SPARK_GRAFT_ANNW_SMALL", "target/sf1")
    val large = sys.env.getOrElse("SPARK_GRAFT_ANNW_LARGE", "target/sf10")
    val qCap = sys.env.getOrElse("SPARK_GRAFT_ANNW_QCAP", "20000").toLong
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_ANNW_REPS", "3").toInt)

    def run(dir: String): (Double, Long) = {
      var rows = -1L
      val times = (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        val df = graft.SimilarityQueries.annIvfPipeline(spark, dir, Some(qCap))
        // Count the rows from the timed job itself via an observation —
        // a second full pipeline execution per rep (the r16 shape)
        // roughly doubled the witness's untimed wall time at sf10.
        val obs = new org.apache.spark.sql.Observation(s"annw_$rep")
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
    // JIT/codegen warmup on the small side, untimed (the Bench probe
    // discipline: reading #1 must not carry whole-JVM spin-up).
    graft.SimilarityQueries.annIvfPipeline(spark, small, Some(qCap))
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    val (tS, rS) = run(small)
    val (tL, rL) = run(large)
    val ratio = if (tS > 0) tL / tS else -1.0
    println(
      f"""{"block":"ann_fixed_q","q_cap":$qCap,"reps":$reps,""" +
      f""""small":{"dir":"$small","sec":$tS%.3f,"rows":$rS},""" +
      f""""large":{"dir":"$large","sec":$tL%.3f,"rows":$rL},""" +
      f""""ratio":$ratio%.2f}""")
    spark.stop()
  }
}
