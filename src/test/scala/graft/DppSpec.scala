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
}
