package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Dev-only streaming-throughput micro-bench (round-9 verdict task 6):
  * the streaming twins are correctness-gated (StreamingSpec,
  * batch-equivalence) but had no recorded rows/s. Drives two
  * representative stateful pipelines over the sf0.1 events table
  * end-to-end through the real micro-batch engine (file source →
  * state store → noop sink, Trigger.AvailableNow) and prints
  * rows/second:
  *
  *   dedup-ingest — watermark + dropDuplicates(event_id): per-key
  *     seen-id state, the at-least-once → effectively-once screen
  *   cdc-merge    — mapGroupsWithState per-user argmax: bounded
  *     one-record-per-key state, Update-mode semantics
  *
  * Not part of the driver contract; run by hand, numbers land in
  * PERF.md. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the testdata table is a single parquet FILE; the file-stream
    // source wants a DIRECTORY of arriving files — stage the events
    // into 8 files (untimed) so the stream sees real micro-batches
    val eventsDir = java.nio.file.Files.createTempDirectory("events_in").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(8).write.mode("overwrite").parquet(eventsDir)
    val nRows = spark.read.parquet(eventsDir).count()

    def drive(label: String)(start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val t0 = System.nanoTime()
      val q = start
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stream-bench] $label: $nRows rows in $dt%.2f s = ${nRows / dt}%,.0f rows/s")
    }

    def ckpt() = java.nio.file.Files.createTempDirectory("stream_ck").toString

    // Matrix (round-9 verdict task 9): state-store provider × batch
    // size. The HDFS-backed store pays a per-batch snapshot of the
    // WHOLE store (in-memory map + file upload) — tolerable at few
    // batches, dominant at many small ones; RocksDB keeps native state
    // with incremental changelog-style maintenance. Batch size sweeps
    // the fixed ~0.4 s/micro-batch overhead against state-store cost:
    // filesPerTrigger=1 → 8 micro-batches, 4 → 2, 8 → 1.
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val batchSizes = Seq(1, 4, 8)

    for ((pname, pclass) <- providers; fpt <- batchSizes) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", pclass)

      // 1 — watermarked ingest dedup (dropDuplicates state)
      drive(s"dedup-ingest/$pname/files=$fpt") {
        EventStream.dedupedIngest(
            EventStream.fileStream(spark, eventsDir, maxFilesPerTrigger = fpt))
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt())
          .trigger(Trigger.AvailableNow()).start()
      }

      // 2 — CDC merge (mapGroupsWithState, one state record per user)
      drive(s"cdc-merge/$pname/files=$fpt") {
        val ops = EventStream.fileStream(spark, eventsDir, maxFilesPerTrigger = fpt)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), (col("event_type") === "delete").as("is_delete"),
            col("value"))
          .as[EventStream.CdcOp]
        EventStream.cdcStreaming(ops)
          .toDF()
          .writeStream.format("noop")
          .outputMode("update")
          .option("checkpointLocation", ckpt())
          .trigger(Trigger.AvailableNow()).start()
      }
    }

    spark.stop()
  }
}
