package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{TextFunctions => T}

/** Training-batch preparation operators: sequence packing (fill
  * fixed-token-budget bins) and deterministic source-mix sampling —
  * the steps between a curated corpus and a training dataloader.
  */
object PackQueries {

  /** Token budget per packed sequence bin. */
  private val BinBudget = 512L

  /** Target docs per packing shard. Cumulative-sum packing is inherently
    * sequential, so it runs per shard — each shard's window is an
    * independent partition, which is what makes this scale (one global
    * cumsum would serialize 100 TB through one task). The shard COUNT is
    * derived from the input size ([[packShards]]), so parallelism grows
    * with the data instead of being capped at a constant; assignment is
    * deterministic (doc_id mod). */
  private val DocsPerShard = 64L

  /** Shard count for an n-doc input: ceil(n / [[DocsPerShard]]), ≥ 1.
    * 8 at the sf0.01 verification scale (n = 500) — the oracle derives
    * the same count with a scalar subquery, so it tracks any scale. */
  def packShards(n: Long): Long =
    math.max(1L, (n + DocsPerShard - 1) / DocsPerShard)

  /** Greedy-by-order sequence packing: within a shard, docs are taken in
    * doc_id order and a doc goes to bin floor(exclusive-prefix-tokens /
    * budget) — the streaming-friendly approximation of first-fit (docs
    * longer than the budget get a bin of their own, never split). */
  val pack: Q = Q(
    "pack_sequences",
    (s, dir) => {
      val d = table(s, dir, "documents")
      val shards = packShards(d.count())
      val docs = d
        .select(col("doc_id"),
          (col("doc_id") % shards).cast("int").as("shard"),
          least(T.tokenCount(col("text")).cast("long"), lit(BinBudget))
            .as("n_tokens"))
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          floor((col("cum_tokens") - col("n_tokens")) / BinBudget)
            .cast("long").as("bin_idx"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH params AS (
         |  SELECT GREATEST(1, CAST(CEIL(COUNT(*) / $DocsPerShard.0) AS BIGINT)) AS shards
         |  FROM documents),
         |docs AS (
         |  SELECT doc_id,
         |         CAST(doc_id % params.shards AS INT) AS shard,
         |         least(CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT), $BinBudget) AS n_tokens
         |  FROM documents, params),
         |c AS (
         |  SELECT doc_id, shard, n_tokens,
         |         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM docs)
         |SELECT doc_id, shard, n_tokens,
         |       CAST(floor((cum_tokens - n_tokens) / $BinBudget) AS BIGINT) AS bin_idx
         |FROM c
         |ORDER BY doc_id""".stripMargin))

  /** Chunk length (tokens) and overlap for [[chunk]] — stride =
    * len − overlap, the sliding-window shape every context-length-bound
    * training pipeline cuts long documents into. */
  private val ChunkLen = 128
  private val ChunkOverlap = 32
  private val ChunkStride = ChunkLen - ChunkOverlap

  /** Document chunking: split each doc into overlapping fixed-token
    * windows — the complement of [[pack]] (packing never splits a doc;
    * chunking is what makes over-budget docs packable). Window starts
    * are `sequence(0, n-1, stride)`, so the last window may be short
    * but every token lands in ≥ 1 chunk; each output row carries the
    * chunk text (token-joined), its index, and its token count.
    * Embarrassingly parallel: explode + slice per row, no shuffle
    * before the output sort. */
  val chunk: Q = Q(
    "text_chunk",
    (s, dir) => {
      val toks = T.tokens(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), greatest(size(col("t")) - 1, lit(0)),
            lit(ChunkStride))).as("start"))
        .select(
          col("doc_id"),
          (col("start") / ChunkStride).cast("long").as("chunk_idx"),
          concat_ws(" ", slice(col("t"), col("start") + 1, lit(ChunkLen)))
            .as("chunk_text"),
          least(size(col("t")) - col("start"), lit(ChunkLen)).cast("long")
            .as("n_tokens"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some(
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |w AS (
         |  SELECT doc_id, t, unnest(generate_series(0, greatest(len(t) - 1, 0), $ChunkStride)) AS start
         |  FROM d)
         |SELECT doc_id,
         |       CAST(start / $ChunkStride AS BIGINT) AS chunk_idx,
         |       array_to_string(list_slice(t, start + 1, start + $ChunkLen), ' ') AS chunk_text,
         |       CAST(least(len(t) - start, $ChunkLen) AS BIGINT) AS n_tokens
         |FROM w
         |ORDER BY doc_id, chunk_idx""".stripMargin))

  /** Deterministic source-mix sampling: each source gets a per-mille
    * keep quota; a doc is kept iff its content-hash bucket falls under
    * the quota. Hash-gated (not rand()): reproducible across retries,
    * engines, and partitionings — the property a training-data recipe
    * needs. Quota here: even sources upsampled (800 per-mille), odd
    * downsampled (250 per-mille). */
  val sampleMix: Q = Q(
    "sample_mix",
    (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        (T.fingerprintRolling(col("text")) % 1000).as("bucket"),
        when(regexp_extract(col("source"), "src(\\d+)", 1)
          .try_cast("int") % 2 === 0, lit(800)).otherwise(lit(250))
          .as("quota"))
      .filter(col("bucket") < col("quota"))
      .select(col("doc_id"), col("source"), col("bucket"))
      .orderBy("doc_id"),
    Some {
      val fp = T.polyHashSql("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
      s"""SELECT doc_id, source, bucket FROM (
         |  SELECT doc_id, source,
         |         $fp % 1000 AS bucket,
         |         CASE WHEN TRY_CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 2 = 0
         |              THEN 800 ELSE 250 END AS quota
         |  FROM documents)
         |WHERE bucket < quota
         |ORDER BY doc_id""".stripMargin
    })

  def all: Seq[Q] = Seq(pack, chunk, sampleMix)
}
