package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{HashFunctions => H, TextFunctions => T}

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

  /** Temperature-flattened domain mixing (T = 2): sampling weight
    * ∝ n_d^(1/T), the standard flattening that keeps small domains
    * fully while downsampling hot ones ∝ n_d^(-1/2) — the multilingual /
    * multi-domain mixing step of every LLM data recipe. The `source`
    * column is uniform in the harness corpus (degenerate for a mixing
    * fixture), so a skewed pseudo-domain is planted deterministically:
    * dom = floor(sqrt(doc_id % 100)) gives sizes ∝ 1,3,…,19 per 100
    * docs — both cap-at-1.0 and fractional rates are exercised.
    *
    * Determinism rules: the acceptance gate is hash-bucketed (same as
    * [[sampleMix]] — retry/partitioning/engine invariant, never
    * rand()); the global Σ√n_d crosses engines as an exact
    * DECIMAL(28,12) sum (double summation is accumulation-order-
    * dependent — the Registry decimal rule applied to derived weights);
    * everything else is IEEE-exact (sqrt, *, /) with the SAME
    * association order written on both sides.
    *
    * Scale: two tiny aggregates (|domains| rows) + two broadcast joins;
    * the corpus is scanned once and never shuffled. */
  val sampleTemperature: Q = Q(
    "sample_temperature",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"),
          floor(sqrt((col("doc_id") % 100).cast("double"))).cast("int").as("dom"),
          (T.fingerprintRolling(col("text")) % 1000000).as("bucket"))
      val counts = d.groupBy(col("dom")).agg(count(lit(1)).as("n_d"))
      val totals = counts.agg(
        sum(col("n_d")).cast("long").as("n_total"),
        sum(sqrt(col("n_d").cast("double")).cast("decimal(28,12)")).as("sum_w"))
      val ppm = counts.crossJoin(broadcast(totals))
        .select(col("dom"), col("n_d"),
          floor(least(lit(1.0),
            ((col("n_total") / 2).cast("long").cast("double") / col("sum_w").cast("double"))
              * sqrt(col("n_d").cast("double")) / col("n_d").cast("double"))
            * 1000000.0).cast("long").as("keep_ppm"))
      d.join(broadcast(ppm), Seq("dom"))
        .filter(col("bucket") < col("keep_ppm"))
        .select(col("doc_id"), col("dom"), col("n_d"), col("keep_ppm"))
        .orderBy("doc_id")
    },
    Some {
      val fp = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ''), " +
        "c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % " + T.HashMod + ")"
      s"""WITH d AS (
         |  SELECT doc_id,
         |         CAST(floor(sqrt(CAST(doc_id % 100 AS DOUBLE))) AS INT) AS dom,
         |         $fp % 1000000 AS bucket
         |  FROM documents),
         |c AS (SELECT dom, count(*) AS n_d FROM d GROUP BY dom),
         |t AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n_total,
         |             SUM(CAST(sqrt(CAST(n_d AS DOUBLE)) AS DECIMAL(28,12))) AS sum_w
         |      FROM c),
         |p AS (
         |  SELECT c.dom, c.n_d,
         |         CAST(floor(least(1.0,
         |           (CAST(t.n_total // 2 AS DOUBLE) / CAST(t.sum_w AS DOUBLE))
         |             * sqrt(CAST(c.n_d AS DOUBLE)) / CAST(c.n_d AS DOUBLE)) * 1000000.0) AS BIGINT)
         |           AS keep_ppm
         |  FROM c, t)
         |SELECT d.doc_id, d.dom, p.n_d, p.keep_ppm
         |FROM d JOIN p USING (dom)
         |WHERE d.bucket < p.keep_ppm
         |ORDER BY doc_id""".stripMargin
    })

  /** Per-stratum priority sample size. */
  private val WeightedK = 16

  /** Weighted sampling without replacement, one bounded sample per
    * source stratum — priority sampling (Duffield–Lund–Thorup): each doc
    * draws a deterministic 48-bit "uniform" u from its id hash and gets
    * priority u ⌊/⌋ w (weight w = its length); the k SMALLEST priorities
    * per stratum win, so P(selected) grows ∝ w. Longer documents are
    * favored exactly the way a token-budgeted corpus sample wants.
    *
    * Determinism rules: u is the engine-neutral md5 hex value (the
    * sketch family's hash — same SQL text both engines), the priority is
    * BIGINT integer division (u < 2^48, w ≥ 1: no overflow, no float),
    * ties break on doc_id. rand()-free for the same reason as
    * [[sampleMix]]: reproducible across retries, engines, partitionings.
    *
    * Scale shape: per-stratum top-k runs on the bounded-heap aggregate
    * (graft.plans.TopKByScore), NOT a rank window — the map-side partial
    * pass reduces every partition to ≤ k pairs per stratum, so the
    * shuffle carries k-element buffers instead of the corpus, and a hot
    * stratum never serializes through one window task. Priorities are
    * < 2^48 so their negation is exact in the aggregate's DOUBLE score
    * slot (IEEE doubles are exact integers to 2^53). */
  val sampleWeighted: Q = Q(
    "sample_weighted",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          greatest(col("n_chars"), lit(1L)).as("w"),
          expr(SketchQueries.hexValSql("md5(CAST(doc_id AS STRING))")).as("u"))
        .select(col("source"), col("doc_id"), col("w"),
          expr("u div w").as("pr"))
      d.groupBy(col("source"))
        .agg(H.topKByScore(-col("pr").cast("double"), col("doc_id"), WeightedK)
          .as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "p")))
        .join(d.select(col("doc_id"), col("w"), col("pr")),
          col("p.id") === col("doc_id"))
        .select(col("source"), col("doc_id"), col("w"), col("pr"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy("source", "rank")
    },
    Some {
      val u = SketchQueries.hexValSqlDdb("md5(CAST(doc_id AS VARCHAR))")
      s"""WITH d AS (
         |  SELECT source, doc_id, GREATEST(n_chars, 1) AS w,
         |         $u // GREATEST(n_chars, 1) AS pr
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, w, pr,
         |         row_number() OVER (PARTITION BY source ORDER BY pr, doc_id)
         |           AS rank
         |  FROM d)
         |SELECT source, doc_id, w, pr, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $WeightedK
         |ORDER BY source, rank""".stripMargin
    })

  /** Deterministic stratified train/val/test split: each doc's
    * content-hash bucket (mod 100) maps to 80/10/10 — hash-ranged, so
    * the split is reproducible across retries, engines and
    * partitionings, a doc never changes split when the corpus grows
    * (the property a random split lacks), and within every source the
    * split is automatically proportional because the content hash is
    * independent of `source`. Per-row map over one scan — no shuffle
    * before the output sort; at 100 TB this is a projection. */
  val splitStratified: Q = Q(
    "split_stratified",
    (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        (T.fingerprintRolling(col("text")) % 100).as("bucket"))
      .select(col("doc_id"), col("source"),
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id"),
    Some {
      val fp = T.polyHashSql("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
      s"""SELECT doc_id, source,
         |       CASE WHEN $fp % 100 < 80 THEN 'train'
         |            WHEN $fp % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    })

  /** Exact length-quartile bucketing — batching docs of similar token
    * length minimizes padding waste in a training dataloader. Exact
    * global quantiles WITHOUT a global sort: cumulative counts over the
    * value-compressed histogram (one row per DISTINCT length — bounded
    * by max doc length, never corpus size), thresholds at ranks
    * ceil(qN/4) broadcast back, assignment a pure comparison. Ties at a
    * boundary all take the lower bucket (value-determined, so the
    * assignment is deterministic and partition-invariant; bucket sizes
    * flex by the tie count). The single-task histogram window is a
    * reduction over ~10²–10⁵ rows at any corpus scale — the corpus
    * itself sees one groupBy shuffle and a broadcast. */
  val lengthBuckets: Q = Q(
    "pack_length_buckets",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), T.tokenCount(col("text")).cast("long").as("n_tokens"))
      val hist = d.groupBy(col("n_tokens")).agg(count(lit(1)).as("c"))
      val cumW = Window.partitionBy(pmod(col("n_tokens"), lit(1)))
        .orderBy(col("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(cumW))
      // rank thresholds as literals from one count job (footer-only
      // under parquet aggregatePushDown — the lshPlanes precedent)
      val n = d.count()
      def rank(q: Int): Long = (q * n + 3) / 4
      val th = cum.agg(
        min(when(col("cum") >= rank(1), col("n_tokens"))).as("t1"),
        min(when(col("cum") >= rank(2), col("n_tokens"))).as("t2"),
        min(when(col("cum") >= rank(3), col("n_tokens"))).as("t3"))
      d.crossJoin(broadcast(th))
        .select(col("doc_id"), col("n_tokens"),
          when(col("n_tokens") <= col("t1"), 1)
            .when(col("n_tokens") <= col("t2"), 2)
            .when(col("n_tokens") <= col("t3"), 3)
            .otherwise(4).cast("int").as("bucket"))
        .orderBy("doc_id")
    },
    Some {
      val toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |h AS (SELECT n_tokens, count(*) AS c FROM d GROUP BY n_tokens),
         |cu AS (SELECT n_tokens, SUM(c) OVER (ORDER BY n_tokens
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
         |t AS (SELECT count(*) AS n FROM d),
         |th AS (SELECT
         |         min(CASE WHEN cum >= (1 * t.n + 3) // 4 THEN n_tokens END) AS t1,
         |         min(CASE WHEN cum >= (2 * t.n + 3) // 4 THEN n_tokens END) AS t2,
         |         min(CASE WHEN cum >= (3 * t.n + 3) // 4 THEN n_tokens END) AS t3
         |       FROM cu, t)
         |SELECT d.doc_id, d.n_tokens,
         |       CASE WHEN d.n_tokens <= th.t1 THEN 1
         |            WHEN d.n_tokens <= th.t2 THEN 2
         |            WHEN d.n_tokens <= th.t3 THEN 3
         |            ELSE 4 END AS bucket
         |FROM d, th
         |ORDER BY doc_id""".stripMargin
    })

  /** Fractional-epoch upsampling — the standard LLM data recipe states
    * repeats per dataset ("3.4 epochs of wiki, 1.1 of web"): every doc
    * appears floor(e) times, plus one more for a hash-chosen e-frac
    * slice of docs. The epoch factor is carried as integer
    * THOUSANDTHS (1000 + (src#%4)·850 → 1.0/1.85/2.7/3.55 epochs), so
    * whole/fractional split is exact integer arithmetic on both
    * engines — no float epoch ever exists to drift. The acceptance
    * gate is the same content-hash bucketing as [[sampleMix]]
    * (deterministic under retry/partitioning); replication is
    * explode(sequence) — one pass, no self-union (PERF.md round-5:
    * unionAll re-executes the subtree per branch). copy_idx makes the
    * multiplicity explicit for downstream shuffling/packing. */
  val sampleEpochs: Q = Q(
    "sample_epochs",
    (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        (lit(1000L) + regexp_extract(col("source"), "src(\\d+)", 1)
          .try_cast("long") % 4 * 850L).as("ep1000"),
        (T.fingerprintRolling(col("text")) % 1000).as("bucket"))
      .withColumn("n_copies",
        (col("ep1000") - col("ep1000") % 1000) / 1000 +
          when(col("bucket") < col("ep1000") % 1000, 1).otherwise(0))
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), col("n_copies").cast("long") - 1))
          .as("copy_idx"))
      .orderBy("doc_id", "copy_idx"),
    Some {
      val fp = T.polyHashSql("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |         1000 + TRY_CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) % 4 * 850 AS ep1000,
         |         $fp % 1000 AS bucket
         |  FROM documents),
         |n AS (SELECT doc_id, source,
         |        (ep1000 - ep1000 % 1000) // 1000 +
         |          CASE WHEN bucket < ep1000 % 1000 THEN 1 ELSE 0 END AS n_copies
         |      FROM b)
         |SELECT doc_id, source,
         |       unnest(generate_series(0, n_copies - 1)) AS copy_idx
         |FROM n
         |ORDER BY doc_id, copy_idx""".stripMargin
    })

  // ------------------------------------------------ curriculum order

  /** Intra-phase shuffle buckets: global positions are computed per
    * (phase, bucket) so no window ever sees more than ~n/(phases·32)
    * rows. */
  private val CurriculumBuckets = 32L

  /** LCG constants for the deterministic shuffle key (Knuth/glibc
    * family); doc_id · a stays far under 2^63 for any realistic id. */
  private val CurA = 1103515245L
  private val CurC = 12345L

  /** Curriculum ordering: emit the corpus as ONE totally-ordered
    * training sequence — easy (high pinned-quality-score) phases first,
    * deterministically shuffled WITHIN each phase (a sorted-by-quality
    * stream would correlate adjacent batches; training wants phase-level
    * ordering with batch-level randomness). The position is the exact
    * global dataloader index.
    *
    * The scale problem this solves: a naive `row_number() OVER (ORDER
    * BY phase, shuffle_key)` serializes the whole corpus through one
    * partition. Instead positions are TWO-LEVEL: each doc ranks inside
    * its (phase, shuffle-bucket) — [[CurriculumBuckets]] buckets per
    * phase, each window ~n/(4·32) rows, fully parallel — and a
    * ≤ 4·32-row per-group count table (computed map-side) supplies
    * each group's exclusive global offset via a prefix sum over that
    * tiny frame (constant partition key — bounded by construction).
    * position = group offset + in-group rank: an exact global index
    * with no global sort and no single-partition window over data.
    * The shuffle key is a deterministic LCG of doc_id mod the shared
    * [[graft.functions.TextFunctions.HashMod]] — engine-exact integer
    * arithmetic, same value in the oracle. */
  val curriculum: Q = Q(
    "pack_curriculum",
    (s, dir) => {
      val q = T.qualityScore(col("text"))
      val ph = table(s, dir, "documents")
        .select(col("doc_id"),
          q.as("quality_score"),
          when(q >= 0.75, 0L).when(q >= 0.5, 1L).when(q >= 0.25, 2L)
            .otherwise(3L).as("phase"),
          ((col("doc_id") * CurA + CurC) % T.HashMod).as("sk"))
        .withColumn("bucket", col("sk") % CurriculumBuckets)
      val w = Window.partitionBy(col("phase"), col("bucket"))
        .orderBy(col("sk"), col("doc_id"))
      val ranked = ph.withColumn("rk", row_number().over(w))
      val counts = ph.groupBy(col("phase"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      // prefix sum over the ≤ phases·buckets-row group table. The
      // constant partition key must be NON-FOLDABLE: `phase * 0`
      // constant-folds to a literal, Catalyst drops foldable partition
      // expressions, and the window degrades to an unpartitioned one
      // (WindowExec "no partition defined" warnings in every sweep —
      // r10 cleanup). pmod(phase, 1) is 0 for every row but survives
      // folding, keeping the bounded-frame idiom warning-free.
      val wOff = Window.partitionBy(pmod(col("phase"), lit(1)))
        .orderBy(col("phase"), col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = counts
        .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
        .select(col("phase"), col("bucket"), col("off"))
      ranked.join(broadcast(offsets), Seq("phase", "bucket"))
        .select((col("off") + col("rk")).as("position"),
          col("doc_id"), col("phase"), col("quality_score"))
        .orderBy("position")
    },
    Some(
      s"""WITH scored AS (
         |  SELECT doc_id, ${TextOracleSql.quality} AS q FROM documents),
         |ph AS (
         |  SELECT doc_id, q,
         |         CASE WHEN q >= 0.75 THEN 0 WHEN q >= 0.5 THEN 1
         |              WHEN q >= 0.25 THEN 2 ELSE 3 END AS phase,
         |         (doc_id * $CurA + $CurC) % ${T.HashMod} AS sk
         |  FROM scored),
         |b AS (SELECT *, sk % $CurriculumBuckets AS bucket FROM ph),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY phase, bucket ORDER BY sk, doc_id) AS rk
         |  FROM b),
         |g AS (SELECT phase, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
         |o AS (
         |  SELECT phase, bucket,
         |         COALESCE(SUM(cnt) OVER (
         |           ORDER BY phase, bucket
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM g)
         |SELECT CAST(o.off + r.rk AS BIGINT) AS position, r.doc_id,
         |       r.phase, r.q AS quality_score
         |FROM r JOIN o USING (phase, bucket)
         |ORDER BY position""".stripMargin))

  def all: Seq[Q] =
    Seq(pack, chunk, sampleMix, sampleTemperature, sampleWeighted,
      splitStratified, lengthBuckets, sampleEpochs, curriculum)
}
