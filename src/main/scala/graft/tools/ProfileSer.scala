package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only A/B: deserialized vs serialized caching for the iterative
  * pair-graph kernel (r16's heap-reversal follow-up, PERF.md).
  *
  * The r16 heap A/B showed the fixpoint family runs 1.4-3.3x SLOWER at
  * -Xmx24g than at 8g: big heaps keep the persisted index/adjacency
  * DESERIALIZED on heap, and every count-barrier GC walks that live
  * object graph, while small heaps evict serialized bytes to the
  * (tmpfs) disk tier whose re-reads are cheap. The obvious follow-up:
  * would MEMORY_AND_DISK_SER — serialized bytes IN memory — give the
  * small-GC-surface behavior at any heap size? This main measures the
  * LPA-shaped kernel (persisted shingle index -> pair join -> persisted
  * adjacency -> 4 majority rounds + count barriers) under both levels,
  * at whatever -Xmx the JVM got (run twice: default 8g and
  * SPARK_DRIVER_MEM=24g).
  *
  * Run: sbt 'runMain graft.tools.ProfileSer' (env: SPARK_GRAFT_SF_DIR,
  * default target/sf1; SPARK_GRAFT_SER_REPS, default 3). */
object ProfileSer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_SER_REPS", "3").toInt)
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = graft.Bench.localDir().fold(b0)(d => b0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()
    val xmx = Runtime.getRuntime.maxMemory() / (1024 * 1024)

    def kernel(level: StorageLevel): Double = {
      val t0 = System.nanoTime()
      val docs = graft.DedupQueries.corpus(spark, sfDir)
      val ex = graft.DedupQueries.shingleIndexOf(docs).persist(level)
      val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = ex.toDF("i", "h").join(ex.toDF("j", "h"), Seq("h"))
        .filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      val pairs = inter
        .join(sizes.toDF("i", "na"), Seq("i"))
        .join(sizes.toDF("j", "nb"), Seq("j"))
        .select(col("i"), col("j"))
        .persist(level)
      val adj = pairs.select(col("i").as("src"), col("j").as("dst"))
        .unionAll(pairs.select(col("j").as("src"), col("i").as("dst")))
        .persist(level)
      adj.count()
      var labels = adj.select(col("src").as("v")).distinct()
        .select(col("v"), col("v").as("lbl"))
        .persist(level)
      labels.count()
      for (_ <- 1 to 4) {
        val next = adj
          .join(labels.withColumnRenamed("v", "dst"), Seq("dst"))
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          .agg(max(struct(col("c"), (-col("lbl")).as("tb"),
            col("lbl").as("l"))).as("m"))
          .select(col("src").as("v"), col("m.l").as("lbl"))
          .persist(level)
        next.count() // the convergence-test barrier shape
        labels.unpersist()
        labels = next
      }
      labels.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }

    // untimed warmup (JIT) with the deserialized level
    kernel(StorageLevel.MEMORY_AND_DISK)
    for ((name, lvl) <- Seq(
        "MEMORY_AND_DISK" -> StorageLevel.MEMORY_AND_DISK,
        "MEMORY_AND_DISK_SER" -> StorageLevel.MEMORY_AND_DISK_SER)) {
      val ts = (1 to reps).map(_ => kernel(lvl)).sorted
      println(f"[ser] xmx=${xmx}m $name%-20s median ${ts((ts.size - 1) / 2)}%.2f s " +
        s"(all ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
