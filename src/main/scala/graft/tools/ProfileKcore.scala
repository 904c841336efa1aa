package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only round attribution for graph_kcore (the second sf1 monster:
  * 117.9 s in the r18 split sweep vs 3.8 s at sf0.1 — a ~31× decade
  * ratio for 10× data). Replays the peel loop with per-round timing
  * and edge counts, so the superlinear term is attributable: more
  * peel rounds at sf1? bigger per-round cost? or the substrate? */
object ProfileKcore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kcore] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val CoreK = 2
    var edges = t("substrate (ngramPairs)") {
      val e = graft.DedupQueries.ngramPairs(spark, sfDir)
        .select(col("i"), col("j"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    var nEdges = edges.count()
    println(s"[kcore] edges0=$nEdges")
    var converged = nEdges == 0
    var rounds = 0
    while (!converged && rounds < 12) {
      val deg = edges.select(explode(array(col("i"), col("j"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val alive = deg.filter(col("d") >= CoreK).select(col("v"))
      val next = edges
        .join(alive.toDF("i"), Seq("i"), "left_semi")
        .join(alive.toDF("j"), Seq("j"), "left_semi")
        .select(col("i"), col("j"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = t(s"round ${rounds + 1}") { next.count() }
      println(s"[kcore] round ${rounds + 1} edges=$n (removed ${nEdges - n})")
      converged = n == nEdges
      edges.unpersist()
      edges = next
      nEdges = n
      rounds += 1
    }
    println(s"[kcore] rounds=$rounds final_edges=$nEdges")
    t("final degree agg") {
      edges.select(explode(array(col("i"), col("j"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("core_deg"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
