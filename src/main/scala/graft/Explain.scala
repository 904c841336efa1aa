package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // compress: show join/exchange/scan/cache lines only. NB an
      // InMemoryRelation's printout embeds its cached child plan, so a
      // join/scan appearing "twice" may be one cached subtree shown at
      // two read sites — check for InMemoryTableScan before concluding
      // a subtree actually executes twice.
      plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan parquet") || l.contains("PushedFilters") ||
        l.contains("WholeStageCodegen") || l.contains("InMemoryTableScan"))
        .take(40).foreach(println)
    }
    spark.stop()
  }
}
