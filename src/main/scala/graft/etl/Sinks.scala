package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse boundary — SURVEY.md §2.1 S7/S8.
  *
  * The reference's sink is a batched transactional `to_sql` append into
  * SQL Server (cartera.py:182-196: BATCH_SIZE=1000, one transaction,
  * rollback + row localization on error). Spark's JDBC writer expresses
  * the same shape: `batchsize` rows per INSERT round-trip, one
  * transaction per partition task with task-level retry replacing the
  * driver-side rollback bookkeeping. No database ships with the harness,
  * so the JDBC paths are exercised only for plan construction; the
  * parquet path is the harness sink (Verify writes every query result
  * through it).
  */
object Sinks {

  /** S7 — connection validation probe (`SELECT 1` round-trip,
    * cartera.py:45-46). On the harness: a trivial local query; over JDBC:
    * pass `Some(url -> props)` to round-trip the probe remotely. */
  def probe(spark: SparkSession,
            jdbc: Option[(String, java.util.Properties)] = None): Boolean =
    jdbc match {
      case None => spark.sql("SELECT 1").collect()(0).getInt(0) == 1
      case Some((url, props)) =>
        spark.read.jdbc(url, "(SELECT 1) AS probe", props).collect().length == 1
    }

  /** S8 — batched append to a warehouse table (`to_sql if_exists='append'`
    * in 1000-row batches). Partition-parallel on a cluster: each task
    * holds one connection and its own transaction. */
  def appendBatchedJdbc(
      df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 1000): Unit =
    df.write
      .mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** Harness sink: snapshot-partitioned parquet append — the offline
    * stand-in for the warehouse table. Partitioning by the load-stamp
    * column makes the documented latest-snapshot queries (A5/W1)
    * partition-pruned instead of full scans. */
  def appendSnapshotParquet(df: DataFrame, path: String, stampCol: String): Unit =
    df.write
      .mode("append")
      .partitionBy(stampCol)
      .parquet(path)

  /** Bucketed managed table: pre-shuffles once at write time so repeated
    * large joins/aggregations on `keys` are exchange-free at read time —
    * the co-located-join strategy for fact⋈fact at 100 TB (broadcast
    * covers fact⋈dim; bucketing covers what broadcast can't). Both join
    * sides must agree on bucket count and keys. */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
