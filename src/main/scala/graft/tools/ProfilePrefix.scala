package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only stage attribution for dedup_prefix_filter (VERDICT r20
  * item 3: "profile where the time actually goes — stage timeline, not
  * guesses"). Times each phase of the PPJoin pipeline in isolation
  * (noop sink) and prints the governing ROW COUNTS (prefix postings,
  * candidate pairs before/after the length filter, verification
  * fan-out) so the superlinear sf0.1→sf1 term (4.1 s → 164 s in the
  * r18 split sweep, a ~40× decade ratio for 10× data) is attributable
  * to a specific phase. */
object ProfilePrefix {
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
      println(f"[prefix] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val ex = graft.DedupQueries.shingleIndexOf(graft.DedupQueries.corpus(spark, sfDir))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("[prefix] postings=" + t("index persist+count") { ex.count() })
    val tokDf = ex.groupBy(col("h")).agg(count(lit(1)).as("tok_df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = ex.join(tokDf, Seq("h"))
      .withColumn("sz", count(lit(1)).over(byDoc))
      .withColumn("rn",
        row_number().over(byDoc.orderBy(col("tok_df"), col("h"))))
    val prefix = ranked
      .filter(col("rn") <= col("sz") - expr("(7 * sz + 9) DIV 10") + 1)
      .select(col("doc_id"), col("h"), col("sz"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("[prefix] prefix_postings=" + t("rank+prefix persist+count") { prefix.count() })
    // candidate volume: Σ over shingles of prefix-df²/2 bounds the join
    val hotPrefix = prefix.groupBy(col("h")).agg(count(lit(1)).as("pdf"))
    val bound = hotPrefix.agg(
      sum(expr("pdf * (pdf - 1) / 2")).as("pair_bound"),
      max(col("pdf")).as("max_pdf"),
      count(lit(1)).as("distinct_prefix_shingles")).collect()(0)
    println(s"[prefix] pair_bound=${bound.get(0)} max_prefix_df=${bound.get(1)} distinct_prefix_shingles=${bound.get(2)}")
    val candsRaw = prefix.toDF("i", "h", "ni")
      .join(prefix.toDF("j", "h", "nj"), Seq("h"))
      .filter(col("i") < col("j"))
    val candsLen = candsRaw
      .filter(lit(10) * least(col("ni"), col("nj")) >=
        lit(7) * greatest(col("ni"), col("nj")))
    println("[prefix] raw_cand_rows=" + t("cand join (pre-distinct) count") { candsRaw.count() })
    val cands = candsLen.select(col("i"), col("j")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("[prefix] distinct_cands=" + t("len-filter + distinct persist+count") { cands.count() })
    if (sys.env.contains("SPARK_GRAFT_PREFIX_OLD")) {
      val inter = cands
        .join(ex.toDF("i", "h"), Seq("i"))
        .join(ex.toDF("j", "h"), Seq("j", "h"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      println("[prefix] verified_pairs=" + t("OLD verification joins + count") { inter.count() })
    }
    // r21 verification shape: per-doc sorted token arrays + intersect
    val docToks = ex.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("h"))).as("toks"),
        count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("[prefix] docs=" + t("docToks build persist+count") { docToks.count() })
    val paired = cands
      .join(docToks.toDF("i", "ti", "na"), Seq("i"))
      .join(docToks.toDF("j", "tj", "nb"), Seq("j"))
    val pairedShj = cands
      .join(docToks.toDF("i", "ti", "na").hint("shuffle_hash"), Seq("i"))
      .join(docToks.toDF("j", "tj", "nb").hint("shuffle_hash"), Seq("j"))
    t("pair joins SHUFFLE_HASH + array_intersect") {
      pairedShj.select(col("i"), col("j"),
          size(array_intersect(col("ti"), col("tj"))).cast("long").as("c"),
          col("na"), col("nb"))
        .select(col("i"), col("j"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c")))
            .as("jaccard"))
        .filter(col("jaccard") >= graft.DedupQueries.PrefixT)
        .write.format("noop").mode("overwrite").save()
    }
    t("pair joins + DUMMY size() only (join cost isolation)") {
      paired.select(col("i"), col("j"),
          (size(col("ti")) + size(col("tj"))).as("c"), col("na"), col("nb"))
        .write.format("noop").mode("overwrite").save()
    }
    t("pair joins + array_intersect verification") {
      paired.select(col("i"), col("j"),
          size(array_intersect(col("ti"), col("tj"))).cast("long").as("c"),
          col("na"), col("nb"))
        .select(col("i"), col("j"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c")))
            .as("jaccard"))
        .filter(col("jaccard") >= graft.DedupQueries.PrefixT)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    t("registry query cold (the real number)") {
      graft.SparkEntry.queries("dedup_prefix_filter")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
