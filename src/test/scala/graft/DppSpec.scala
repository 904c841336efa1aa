package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the snapshot-partitioned sink: the
  * read-side payoff `Sinks.appendSnapshotParquet` exists for. A fact
  * partitioned on a time column, joined to a dim whose FILTER selects
  * few partition values, must scan only those partitions — at 100 TB
  * the difference between reading one day and reading the table. DPP
  * only fires for partitioned file sources with a selective broadcast
  * side, so this is pinned here (the flat driver testdata can't
  * express it) against both the plan and the actual row counts.
  */
class DppSpec extends SparkSpec {

  test("partition-pruned scan: dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val fact = graft.etl.Sources.table(spark, Sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    graft.etl.Sinks.appendSnapshotParquet(fact, dir, "o_year")

    // the dim must be a real source relation: an inline LocalRelation
    // constant-folds its filter away and DPP's selective-predicate
    // detection never fires
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq((1995, "open"), (1996, "open"), (1997, "closed"),
      (1998, "closed"), (1999, "closed"), (2000, "closed"), (2001, "closed"))
      .toDF("d_year", "d_status")
      .write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(broadcast(spark.read.parquet(dimDir)
          .filter(col("d_status") === "open")),
        col("o_year") === col("d_year"))
    val plan = joined.queryExecution.executedPlan.toString

    // the fact scan's PartitionFilters must carry the runtime subquery
    assert(plan.contains("dynamicpruning"), plan)

    // and the pruning must be semantically right: exactly the rows of
    // the two open years, matching an explicit static filter
    val expected = fact.filter(col("o_year").isin(1995, 1996)).count()
    assert(joined.count() == expected)
    assert(expected > 0)
  }

  test("layout_dpp_scan at sf0.1: runtime pruning opens only the hot month partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val sf01 = "/root/testdata/sf0.1"
    val df = Registry.queries("layout_dpp_scan")(spark, sf01)

    // the fact scan must carry the runtime subquery filter
    assert(df.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      df.queryExecution.executedPlan.toString)

    val rows = df.collect()
    // semantic pin: exactly the hot months, matching the static predicate
    val hotMonths = spark.read
      .parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m")).distinct()
      .filter(expr("(CAST(substr(m, 1, 4) AS INT) * 12 + " +
        "CAST(substr(m, 6, 2) AS INT)) % 4 = 0"))
      .count()
    assert(rows.length == hotMonths && hotMonths > 0, s"${rows.length} vs $hotMonths")

    // runtime pin: the executed fact scan READ only that many partition
    // directories (the numPartitions driver metric counts directories
    // surviving the dynamic filter — a static-only plan reads all ~84)
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec => allNodes(q.plan)
        case _ => Seq.empty
      })
    val factScan = allNodes(df.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec if f.toString.contains("/dpp/") &&
        f.toString.contains("fact") => f
    }.getOrElse(fail("no fact FileSourceScanExec found in executed plan"))
    val partsRead = factScan.metrics("numPartitions").value
    assert(partsRead == hotMonths, s"read $partsRead partitions, hot=$hotMonths")
  }
}
