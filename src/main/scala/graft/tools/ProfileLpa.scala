package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only LPA round-convergence probe (not part of the driver
  * contract). VERDICT r20 item 5 proposes an early-exit convergence
  * check for graph_label_prop; that trade only wins if the label frame
  * actually reaches its fixpoint BEFORE the oracle-pinned LpRounds=4 —
  * synchronous LPA is a deterministic function of the previous round's
  * labels, so labels_k == labels_{k-1} implies every later round is a
  * no-op and early exit is result-identical. This tool counts, per
  * round, how many node labels changed at the given SF, and times each
  * materialized round — the data that decides whether per-round change
  * counting (which converts the single lazy 4-round chain into
  * per-round materializations) can pay for the rounds it skips. */
object ProfileLpa {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = if (args.nonEmpty) args(0).toInt else 4
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
      println(f"[lpa] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.DedupQueries.ngramPairs(spark, sfDir).select(col("i"), col("j"))
    val adj = e.select(col("i").as("src"), col("j").as("dst"))
      .unionAll(e.select(col("j").as("src"), col("i").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = t("adj persist + n") { adj.select(col("src")).distinct().count() }
    println(s"[lpa] n=$n")
    val gParts = math.max(2, math.min(
      spark.sessionState.conf.numShufflePartitions, (n / 65536L).toInt + 1))
    val adjCut = adj.repartition(gParts, col("src"))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK)
    var labels = adjCut.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK)
    t("init labels") { labels.count() }
    for (k <- 1 to rounds) {
      val next = adjCut
        .join(labels.withColumnRenamed("v", "dst"), Seq("dst"))
        .groupBy(col("src"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("lbl")).as("tb"),
          col("lbl").as("l"))).as("m"))
        .select(col("src").as("v"), col("m.l").as("lbl"))
        .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK)
      val changed = t(s"round $k (materialize + changed-count)") {
        next.toDF("v", "nl")
          .join(labels, Seq("v"))
          .filter(col("nl") =!= col("lbl"))
          .count()
      }
      println(s"[lpa] round $k changed=$changed")
      labels = next.toDF("v", "lbl")
    }
    spark.stop()
  }
}
