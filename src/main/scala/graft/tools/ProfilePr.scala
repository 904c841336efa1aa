package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only phase profiler for the iterative graph queries (not part of
  * the driver contract; invoked by hand while tuning). */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
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
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    for (_ <- 1 to 2) {
      val docs = graft.DedupQueries.corpus(spark, sfDir)
      t("raw shingle index (no cap)") {
        graft.DedupQueries.shingleIndexOf(docs)
          .write.format("noop").mode("overwrite").save()
      }
      val exP = graft.DedupQueries.shingleIndexOf(docs)
        .persist(StorageLevel.MEMORY_AND_DISK)
      println("[profile] postings=" + t("index persist+count") { exP.count() })
      t("self-join + group pairs (warm index)") {
        val inter = exP.toDF("i", "h").join(exP.toDF("j", "h"), Seq("h"))
          .filter(col("i") < col("j"))
          .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
        inter.write.format("noop").mode("overwrite").save()
      }
      exP.unpersist()
      t("pairs UNPERSISTED variant") {
        val ex = graft.DedupQueries.shingleIndexOf(docs)
        val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = ex.toDF("i", "h").join(ex.toDF("j", "h"), Seq("h"))
          .filter(col("i") < col("j"))
          .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
        inter
          .join(sizes.toDF("i", "na"), Seq("i"))
          .join(sizes.toDF("j", "nb"), Seq("j"))
          .select(col("i"), col("j"),
            (col("c").cast("double") / (col("na") + col("nb") - col("c")))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.6)
          .write.format("noop").mode("overwrite").save()
      }
      t("pairs PERSISTED (current ngramPairs)") {
        graft.DedupQueries.ngramPairs(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      val e = graft.DedupQueries.ngramPairs(spark, sfDir).select(col("i"), col("j"))
      val adj = e.select(col("i").as("src"), col("j").as("dst"))
        .unionAll(e.select(col("j").as("src"), col("i").as("dst")))
      val bys = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      val adjd = adj.withColumn("d", count(lit(1)).over(bys))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = t("pairs+adjd+count") { adjd.select(col("src")).distinct().count() }
      println(s"[profile] n=$n edges=" + t("edge count (cached)") { adjd.count() })
      val gParts = 2
      val adjCut = t("repartition+cut") {
        val d = spark.createDataFrame(
          adjd.repartition(gParts, col("src")).rdd, adjd.schema)
        d.count(); d
      }
      val PrScale = 1000000000000L
      val init = PrScale / n; val tele = (PrScale * 15L) / (100L * n)
      var ranks = adjCut.select(col("src").as("v")).distinct()
        .select(col("v"), lit(init).as("r"))
      t("8 rounds (one job)") {
        var r = ranks
        for (_ <- 1 to 8) {
          r = adjCut.join(r.withColumnRenamed("v", "src"), Seq("src"))
            .select(col("dst").as("v"), expr("r div d").as("c"))
            .groupBy(col("v"))
            .agg((lit(tele) + expr("(85 * sum(c)) div 100")).as("r"))
        }
        r.write.format("noop").mode("overwrite").save()
      }
      t("orderBy tail") {
        graft.SparkEntry.queries("graph_pagerank")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
