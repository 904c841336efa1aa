package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only phase profiler for graph_bfs_reach (invoked by hand). */
object ProfileBfs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val e = t("ngramPairs materialize") {
        val e = graft.DedupQueries.ngramPairs(spark, sfDir).select(col("i"), col("j"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      }
      val adj = t("adj persist+count") {
        val adj = e.select(col("i").as("src"), col("j").as("dst"))
          .unionAll(e.select(col("j").as("src"), col("i").as("dst")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        adj.count(); adj
      }
      val seeds = graft.DedupQueries.corpus(spark, sfDir)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("v"), lit(0L).as("hop"))
      var d = seeds
      for (r <- 1 to 4) {
        d = t(s"round $r") {
          val n = d.unionAll(
            d.join(adj, col("v") === col("src"))
              .select(col("dst").as("v"), (col("hop") + 1).as("hop")))
            .groupBy(col("v")).agg(min(col("hop")).as("hop"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          n.count(); n
        }
      }
      t("final sort+noop") {
        d.select(col("v").as("doc_id"), col("hop")).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
