package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only skew-mitigation A/B (round-9 verdict task 8): the SAME
  * skewed join driven three ways —
  *
  *   baseline   — plain SMJ/hash join, AQE skew-split OFF
  *   aqe-skew   — AQE skew-join split ON (thresholds scaled to the
  *                fixture: the defaults trigger at 256 MB partitions,
  *                which a local-box fixture never reaches — production
  *                leaves them alone, a demo must scale them down)
  *   salted     — graft.etl.Skew.saltedJoin (8 salts)
  *
  * Fixture: lineitem with every 3rd row's orderkey collapsed onto ONE
  * hot key (~33% of the fact on a single join key), joined to orders,
  * revenue per priority. All three variants must produce identical
  * aggregates (asserted) — the A/B is purely the stage shape/time.
  *
  * Not part of the driver contract; run by hand, numbers land in
  * PERF.md, guidance lands in etl/Skew.scala's scaladoc. */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // keep the join an SMJ so skew actually lands on a reducer: the
      // orders side at sf0.1 fits the broadcast threshold and a
      // broadcast join has no shuffle to skew
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val HotKey = 1L
    // 10× replicated fact (~6M rows at sf0.1) with ~1/3 of rows on ONE
    // hot key — without the inflation every variant finishes sub-second
    // at 32 threads and the A/B can't separate (first-cut measurement)
    def fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("rep", explode(sequence(lit(1), lit(10))))
      .select(
        when((col("l_orderkey") * 8 + col("l_linenumber") + col("rep")) % 3 === 0,
          lit(HotKey))
          .otherwise(col("l_orderkey")).as("o_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))).as("rev"))

    def run(label: String)(mk: => DataFrame): Seq[(String, Long, java.math.BigDecimal)] = {
      // warm + correctness snapshot
      val rows = agg(mk).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
        .sortBy(_._1).toSeq
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        agg(mk).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // Final-plan skew markers: must drive the SAME QueryExecution that
      // executed (a .write spawns its own), and only a post-execution
      // AdaptiveSparkPlan prints the final AQEShuffleRead shape.
      val df = agg(mk)
      df.collect()
      val skewMarks = "skew".r.findAllIn(
        df.queryExecution.executedPlan.toString.toLowerCase).length
      println(f"[skew-bench] $label%-10s median ${times.sorted.apply(1)}%.2f s (runs ${times.map(t => f"$t%.2f").mkString("/")}; final-plan skew markers: $skewMarks)")
      rows
    }

    def setAqe(skew: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      if (skew) {
        // scale the trigger to the fixture (defaults: factor 5.0 AND
        // 256 MB absolute floor — the floor never trips on a 600k-row
        // local fixture)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        // forceOptimizeSkewedJoin: accept the extra shuffle if needed
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      } else {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        // reset EVERYTHING the skew branch touched — leaked confs
        // (advisory size, forceOptimize) would make the baseline and
        // salted variants run under different shuffle targets than
        // they were measured with (caught in r10 review)
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
      }
    }

    setAqe(skew = false)
    val base = run("baseline")(fact.join(orders, Seq("o_orderkey")))
    setAqe(skew = true)
    val viaAqe = run("aqe-skew")(fact.join(orders, Seq("o_orderkey")))
    setAqe(skew = false)
    val salted = run("salted")(
      graft.etl.Skew.saltedJoin(fact, orders, Seq("o_orderkey"), 8))

    require(base == viaAqe && base == salted,
      s"variant results diverged:\nbase=$base\naqe=$viaAqe\nsalted=$salted")
    println("[skew-bench] all three variants byte-identical aggregates")
    spark.stop()
  }
}
