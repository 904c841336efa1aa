package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{TextFunctions => T}

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Two tiers of queries here:
  *
  *  - REAL DECODE (r10, `mm_decode_bmp_stats` / `mm_decode_png_stats` /
  *    `mm_ahash_cross_codec`): actual encoded images — hand-written
  *    24-bit BMP and JDK ImageIO PNG (real zlib/deflate) — are built,
  *    pushed through the `mapPartitions` codec seam as `Array[Byte]`,
  *    parsed back to pixel planes, and every output statistic is
  *    computed from the DECODED pixels. The DuckDB oracle recomputes
  *    the same statistics from the closed-form pixel formula
  *    ([[graft.multimodal.ImageCodec.synthPixel]]), so a decoder bug —
  *    wrong stride, flipped rows, swapped channels, broken deflate
  *    round-trip — breaks the hash.
  *  - PAYLOAD-BYTE level (the original queries below): catalog,
  *    resize, frame-sample and the content/perceptual dedups operate on
  *    opaque payload BYTES (UTF-8 text bytes playing the payload;
  *    byte-level arithmetic stands in for pixel math where a decode
  *    would sit). These keep exercising the schema/metadata/explosion
  *    plumbing on payloads the oracle can also see, and their dedup
  *    shapes (digest grouping, banded Hamming join) are
  *    decode-agnostic — swap the byte features for [[ImageCodec]]
  *    outputs and the plans are unchanged.
  *
  * The media table is synthesized from `documents`: the UTF-8 text bytes
  * play the payload (ASCII in the testdata, so byte i == ascii(char i)
  * on both engines — the oracles lean on that equivalence).
  *
  * == Known whole-JVM bench mode: slow ImageIO sweeps ==
  *
  * One r13 idle-box sweep ran BOTH ImageIO-decode queries
  * (`mm_decode_png_stats`, `mm_ahash_cross_codec`) ~3.5× slow in ALL
  * reps of that JVM, while every other query held its band; fresh JVMs
  * landed back in-band. Per-query caches are ruled out by construction:
  * readers/writers are ThreadLocal-cached for the JVM's life
  * ([[graft.multimodal.ImageCodec]] — not rebuilt per query), streams
  * are pure in-memory (`setUseCache(false)`), and the decode stage is
  * pre-repartitioned. The remaining candidates are JVM-global: HotSpot
  * tiered-compilation placement of the inflater/filter hot loops (a
  * C1-parked decode loop is a few-× penalty that persists for the JVM)
  * and GC/heap geometry. Since r15, `BENCH_FULL.json` carries per-rep
  * `jit_ms`/`cgen`/`task_ms`/`cpu_ms` records: a slow-mm sweep with
  * `cpu_ms` inflated and `jit_ms` quiet = code running at lower
  * compilation tier; `jit_ms` churning = active (re)compilation;
  * `task_ms` flat with wall inflated = the mode is outside the decode
  * tasks entirely. Adjudication protocol stays two fresh JVMs
  * (`SPARK_GRAFT_BENCH_ONLY`), but the sweep now self-explains.
  */
object MultimodalQueries {

  import graft.multimodal.ImageCodec

  /** Typed row for the per-partition decode path. */
  final case class MediaRow(
      media_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int, n_frames: Int)

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, mean_byte: Double, checksum: Long)

  /** The media catalog: binary payload + typed metadata derived
    * deterministically from doc_id. */
  def media(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (col("doc_id") % 3).cast("int") + 1).as("format"),
      (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
      (lit(48) + (col("doc_id") % 5) * 24).cast("int").as("height"),
      (lit(1) + col("doc_id") % 7).cast("int").as("n_frames"))

  private val ddbMedia =
    """media AS (
      |  SELECT doc_id AS media_id, encode(text) AS payload,
      |         ['png', 'jpeg', 'wav'][CAST(doc_id % 3 AS INT) + 1] AS format,
      |         CAST(64 + (doc_id % 8) * 32 AS INT) AS width,
      |         CAST(48 + (doc_id % 5) * 24 AS INT) AS height,
      |         CAST(1 + doc_id % 7 AS INT) AS n_frames,
      |         text
      |  FROM documents)""".stripMargin

  /** Catalog scan: metadata + byte length + payload hex prefix (Spark hex
    * is uppercase, DuckDB's lowercase — pinned via lower()). */
  val catalog: Q = Q(
    "mm_media_catalog",
    (s, dir) => media(s, dir).select(
      col("media_id"), col("format"), col("width"), col("height"),
      col("n_frames"),
      length(col("payload")).cast("long").as("n_bytes"),
      lower(substring(hex(col("payload")), 1, 16)).as("hex_prefix")),
    // no trailing output sorts in this file (r14): full-result queries,
    // the gate hashes order-insensitively, and the sort's sampling pass
    // re-ran the expensive child (for the codec tiers: the DECODE)
    Some(
      s"""WITH $ddbMedia
         |SELECT media_id, format, width, height, n_frames,
         |       octet_length(payload) AS n_bytes,
         |       lower(substr(hex(payload), 1, 16)) AS hex_prefix
         |FROM media
         |ORDER BY media_id""".stripMargin))

  /** Payload-byte features: per-partition typed iteration over raw
    * payload bytes (mean byte value + rolling checksum of the first 64)
    * — the oracle-visible byte tier. The REAL decoders run in the same
    * mapPartitions seam in [[decodeBmpStats]]/[[decodePngStats]]. */
  val decodeFeatures: Q = Q(
    "mm_decode_features",
    (s, dir) => {
      import s.implicits._
      media(s, dir)
        .select(col("media_id"), col("payload"), col("format"),
          col("width"), col("height"), col("n_frames"))
        .as[MediaRow]
        .mapPartitions { rows =>
          rows.map { r =>
            val head = r.payload.take(64)
            val n = math.max(head.length, 1)
            val mean = head.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / n
            val checksum = head.foldLeft(0L)((acc, b) =>
              (acc * 31 + (b & 0xff)) % T.HashMod)
            MediaFeatures(r.media_id, r.payload.length.toLong, mean, checksum)
          }
        }
        .toDF()
    },
    Some(
      s"""WITH $ddbMedia
         |SELECT media_id,
         |       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
         |       CAST(${TextOracleSql.byteSum("substr(text, 1, 64)")} AS DOUBLE)
         |         / greatest(length(substr(text, 1, 64)), 1) AS mean_byte,
         |       ${T.polyHashSql("substr(text, 1, 64)")} AS checksum
         |FROM media
         |ORDER BY media_id""".stripMargin))

  /** RESIZE (payload-byte tier): halves the declared dims and
    * "re-encodes" by striding every 2nd byte of the first 128 — the
    * Spark side does it with pure array expressions (no UDF). A
    * pixel-level resize plugs [[ImageCodec.decodeBmp]] + a box filter
    * into the [[decodeBmpStats]] seam. */
  val resize: Q = Q(
    "mm_resize",
    (s, dir) => {
      val strided = array_join(
        transform(sequence(lit(1), lit(64)),
          i => substring(col("text_v"), (i * 2).cast("int"), lit(1))), "")
      media(s, dir)
        .withColumn("text_v", col("payload").cast("string"))
        .select(
          col("media_id"),
          (col("width") / 2).cast("int").as("new_width"),
          (col("height") / 2).cast("int").as("new_height"),
          T.polyHash(strided).as("resized_checksum"))
    },
    Some(
      s"""WITH $ddbMedia
         |SELECT media_id,
         |       CAST(width / 2 AS INT) AS new_width,
         |       CAST(height / 2 AS INT) AS new_height,
         |       ${T.polyHashSql("array_to_string(list_transform(generate_series(1, 64), i -> substr(text, i * 2, 1)), '')")} AS resized_checksum
         |FROM media
         |ORDER BY media_id""".stripMargin))

  /** FRAME-SAMPLE (payload-byte tier): up to 4 evenly-strided "frames" per
    * media row, exploded to (media_id, frame_idx, frame_checksum) rows —
    * the row-explosion shape a video pipeline produces. */
  val frameSample: Q = Q(
    "mm_frame_sample",
    (s, dir) => {
      val nSample = least(col("n_frames"), lit(4))
      // floor() on both engines: Spark's int cast truncates but DuckDB's
      // rounds, so the division result must be floored before casting.
      val stride = floor(length(col("payload")) / col("n_frames")).cast("int")
      media(s, dir)
        .withColumn("text_v", col("payload").cast("string"))
        .select(col("media_id"), col("text_v"), nSample.as("k"), stride.as("stride"))
        .select(col("media_id"),
          explode(sequence(lit(0), col("k") - 1)).as("frame_idx"),
          col("text_v"), col("stride"))
        .select(col("media_id"), col("frame_idx"),
          T.polyHash(substring(col("text_v"),
            (col("frame_idx") * col("stride") + 1).cast("int"), lit(16)))
            .as("frame_checksum"))
    },
    Some(
      s"""WITH $ddbMedia,
         |frames AS (
         |  SELECT media_id, text,
         |         CAST(floor(octet_length(payload) / n_frames) AS INT) AS stride,
         |         unnest(generate_series(0, least(n_frames, 4) - 1)) AS frame_idx
         |  FROM media)
         |SELECT media_id, frame_idx,
         |       ${T.polyHashSql("substr(text, frame_idx * stride + 1, 16)")} AS frame_checksum
         |FROM frames
         |ORDER BY media_id, frame_idx""".stripMargin))

  /** Exact media dedup by content hash — the standard first pass of an
    * image/audio dedup pipeline (content-addressable storage shape):
    * hash the PAYLOAD bytes, group on the 128-bit digest, keep the
    * smallest media_id. The shuffle carries (digest, id) — never the
    * payloads — so 100 TB of media moves 24 bytes per object. Re-crawl
    * duplicates are planted (every 7th payload re-ingested under a new
    * id, same bytes) so the group structure is non-trivial at every
    * scale factor. The NEAR-dup continuation (perceptual hash + Hamming
    * bucket join) is the dedup_simhash/embedding-cosine pattern applied
    * to decoded features — the decode seam is mm_decode_features's
    * per-partition stage. Oracle hashes the same bytes (payload == text
    * bytes in this fixture). */
  val dedupContent: Q = Q(
    "mm_dedup_content",
    (s, dir) => {
      val m = media(s, dir).select(col("media_id"), col("payload"))
      val withDups = m.unionAll(
        m.filter(col("media_id") % 7 === 0)
          .select((col("media_id") + 1000000).as("media_id"), col("payload")))
      withDups
        .groupBy(md5(col("payload")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"),
          min(col("media_id")).as("keeper_id"),
          // joined string, not an array: the compare layer sorts rows by
          // every column and array cells don't sort
          concat_ws(",", sort_array(collect_list(col("media_id"))))
            .as("members"))
        .filter(col("n_copies") > 1)
    },
    Some(
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
        |g AS (
        |  SELECT md5(text) AS content_hash, count(*) AS n_copies,
        |         min(media_id) AS keeper_id,
        |         array_to_string(list_sort(array_agg(media_id)), ',') AS members
        |  FROM m GROUP BY 1)
        |SELECT content_hash, n_copies, keeper_id, members
        |FROM g WHERE n_copies > 1
        |ORDER BY keeper_id""".stripMargin))

  /** Perceptual-hash media NEAR-dup — the documented continuation of
    * [[dedupContent]]: a re-encoded image (new JPEG pass, stripped
    * metadata) defeats content-hash dedup because the bytes differ
    * while the picture doesn't. The classic answer is a perceptual
    * hash (aHash/pHash family): downsample, compare each region to the
    * global mean, match on Hamming distance. (The decoded-plane version
    * of this hash — real BMP/PNG pixels — is [[ahashCrossCodec]]; this
    * query keeps the byte-tier twin because its oracle can see the
    * payload bytes directly.)
    *
    * Byte-tier sketch (same seam as [[decodeFeatures]]): 4-byte block sums
    * over the first 128 payload bytes stand in for downsampled pixel
    * means. Sketch bit j = 32·blockSum_j > totalSum — pure integer
    * arithmetic, so the bit is exact on both engines (no float means).
    * Planted re-encodes swap the payload's first two bytes: every
    * 4-byte block sum (and so the sketch) is preserved while md5
    * changes — exactly the pair [[dedupContent]] misses and this
    * catches. Matching reuses the [[DedupQueries.simhashPairs]]
    * machinery: block on 4×8-bit bands of the 32-bit sketch (pigeonhole
    * complete at Hamming ≤ 1), verify bit_count(xor) on bucket-local
    * candidates only — the shuffle carries (band-key, sketch, id),
    * never payloads, and no all-pairs join exists at any scale. */
  val dedupPerceptual: Q = Q(
    "mm_dedup_perceptual",
    (s, dir) => {
      val m = media(s, dir)
        .select(col("media_id"), col("payload").cast("string").as("t"))
      val swapped = concat(
        substring(col("t"), 2, 1), substring(col("t"), 1, 1),
        col("t").substr(lit(3), length(col("t"))))
      val withReenc = m.unionAll(
        m.filter(col("media_id") % 9 === 0)
          .select((col("media_id") + 2000000).as("media_id"),
            swapped.as("t")))
      // The sketch is built from PLAIN scalar expressions with literal
      // positions (128 guarded ascii(substring(head, p, 1)) terms folded
      // into 32 block sums), NOT array HOFs: higher-order lambdas
      // evaluate interpreted per element, while this whole tree stays
      // inside whole-stage codegen (measured ~3× on the sketch pass).
      def charAt(p: Int) =
        when(length(col("head")) >= p,
          ascii(substring(col("head"), p, 1)).cast("long")).otherwise(lit(0L))
      // staged projections: block sums become named columns before the
      // total/bit fold references them twice each, so Catalyst keeps
      // them computed once instead of inlining 33 copies of the tree
      val bsCols = (0 until 32).map(j =>
        (1 to 4).map(o => charAt(j * 4 + o)).reduce(_ + _).as(s"bs$j"))
      val total = (0 until 32).map(j => col(s"bs$j")).reduce(_ + _)
      val phash = (0 until 32).map(j =>
        when(col(s"bs$j") * 32 > col("total"), lit(1L << j))
          .otherwise(lit(0L)))
        .reduce(_ + _)
      val sketched = withReenc
        .withColumn("head", substring(col("t"), 1, 128))
        .select(col("media_id") +: bsCols: _*)
        .withColumn("total", total)
        .select(col("media_id"), phash.as("phash"))
        .persist()
      val bands = (0 until 4)
        .map(b => sketched.select(col("media_id"), col("phash"),
          concat(lit(s"$b|"),
            shiftright(col("phash"), 8 * b) % 256).as("bk")))
        .reduce(_ unionAll _)
      bands.toDF("i", "ph_i", "bk")
        .join(bands.toDF("j", "ph_j", "bk"), Seq("bk"))
        .filter(col("i") < col("j"))
        .select(col("i"), col("j"),
          bit_count(col("ph_i").bitwiseXOR(col("ph_j"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 1)
        .select(col("i"), col("j"), col("hamming"),
          (col("j") >= 2000000).as("is_planted_reencode"))
    },
    Some {
      val bandSelects = (0 until 4)
        .map(b => s"SELECT media_id, phash, '$b|' || CAST((phash >> ${8 * b}) % 256 AS VARCHAR) AS bk FROM h3")
        .mkString(" UNION ALL ")
      """WITH pm AS (
        |  SELECT doc_id AS media_id, text AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         substr(text, 2, 1) || substr(text, 1, 1) || substr(text, 3)
        |  FROM documents WHERE doc_id % 9 = 0),
        |h1 AS (
        |  SELECT media_id,
        |         list_transform(generate_series(1, 128), p ->
        |           CASE WHEN p <= length(substr(t, 1, 128))
        |                THEN CAST(ascii(substr(substr(t, 1, 128), p, 1)) AS BIGINT)
        |                ELSE 0 END) AS chars
        |  FROM pm),
        |h2 AS (
        |  SELECT media_id,
        |         CAST(list_sum(chars) AS BIGINT) AS total,
        |         list_transform(generate_series(0, 31), j ->
        |           chars[j*4+1] + chars[j*4+2] + chars[j*4+3] + chars[j*4+4]) AS bs
        |  FROM h1),
        |h3 AS (
        |  SELECT media_id,
        |         CAST(list_sum(list_transform(generate_series(0, 31), j ->
        |           CASE WHEN bs[j+1] * 32 > total
        |                THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT) AS phash
        |  FROM h2),
        |""".stripMargin +
      s"""bands AS ($bandSelects),
         |pairs AS (
         |  SELECT DISTINCT l.media_id AS i, r.media_id AS j,
         |         bit_count(xor(l.phash, r.phash)) AS hamming
         |  FROM bands l JOIN bands r USING (bk) WHERE l.media_id < r.media_id)
         |SELECT i, j, hamming, j >= 2000000 AS is_planted_reencode
         |FROM pairs WHERE hamming <= 1
         |ORDER BY i, j""".stripMargin
    })

  // ------------------------------------------------ REAL decode (r10)

  /** Typed rows for the real-codec path. */
  final case class MediaSpec(media_id: Long, width: Int, height: Int)
  final case class BmpStats(
      media_id: Long, width: Int, height: Int, n_bytes: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)
  final case class PngStats(
      media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)
  final case class AHashRow(
      media_id: Long, ahash_hi: Long, ahash_lo: Long, codecs_agree: Boolean)

  /** The deterministic image spec shared by the real-decode queries and
    * their oracles: dims reuse the media() metadata derivation, pixels
    * are [[ImageCodec.synthPixel]]'s affine formula.
    *
    * REPARTITIONED before the codec stage: the documents table is one
    * parquet file ⇒ one scan partition, and a CPU-bound mapPartitions
    * downstream of it runs single-threaded (measured: the PNG stage at
    * sf0.1 was ~19 s wall on one core vs ~1.5 s scattered across 32 —
    * PERF.md r10). The shuffle moves only (id, w, h) spec rows — 20
    * bytes each — which is nothing next to the decode CPU it unlocks.
    * On a real 100 TB media lake payloads arrive in thousands of scan
    * partitions and this scatter is unnecessary — but a decode stage
    * must NEVER inherit a single-file scan's parallelism. */
  private def mediaSpecs(s: SparkSession, dir: String): DataFrame =
    mediaSpecsOf(media(s, dir))
      .repartition(s.sparkContext.defaultParallelism)

  /** The (media_id, width, height) spec projection alone — shared with
    * StreamingSpec's batch≡stream pin so the test always exercises the
    * production dims derivation, never a drifted copy. */
  def mediaSpecsOf(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("width"), col("height"))

  /** Shared oracle fragment: explode every (media, pixel) pair and
    * evaluate the synthetic pixel formula — the closed-form ground
    * truth the Spark side must reproduce THROUGH a real encode→decode
    * round-trip. */
  private val ddbPixels =
    """m AS (
      |  SELECT doc_id AS media_id,
      |         CAST(64 + (doc_id % 8) * 32 AS BIGINT) AS w,
      |         CAST(48 + (doc_id % 5) * 24 AS BIGINT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT media_id, w, h, unnest(generate_series(0, w * h - 1)) AS p
      |  FROM m),
      |f AS (
      |  SELECT media_id, w, h, p % w AS x, p // w AS y,
      |         (7 * media_id + 3 * (p % w) + 5 * (p // w)) % 256 AS r,
      |         (11 * media_id + 2 * (p % w) + 7 * (p // w)) % 256 AS g,
      |         (13 * media_id + 5 * (p % w) + 2 * (p // w)) % 256 AS b
      |  FROM px)""".stripMargin

  /** REAL BMP decode: each row builds an actual 24-bit BMP container
    * (synthetic pixels), then PARSES it back — dims from the header,
    * planes from the bottom-up BGR rows — and reports pixel statistics
    * off the decoded planes. n_bytes is the real container length,
    * gated against the oracle's closed-form 54 + stride·h, so the
    * encoder's padding/layout is checked too; width/height come from
    * the parsed header, so the parse is checked; sums/checksum come
    * from decoded pixels, so row order and channel order are checked.
    * Scale shape: one mapPartitions over the spec rows, no shuffle
    * before the output sort; with stored payloads this is a scan-local
    * decode whose output is a few dozen bytes/row. */
  /** The BMP encode→decode→stats stage as a reusable Dataset
    * transformation: a pure mapPartitions, so the SAME code runs over a
    * batch frame and a readStream micro-batch (StreamingSpec pins the
    * equivalence — the codec tier is streaming-composable for free). */
  def bmpStatsStage(specs: org.apache.spark.sql.Dataset[MediaSpec]): org.apache.spark.sql.Dataset[BmpStats] = {
    import specs.sparkSession.implicits._
    specs.mapPartitions { rows =>
      rows.map { m =>
        val bytes = ImageCodec.encodeBmp(m.width, m.height,
          (x, y) => ImageCodec.synthPixel(m.media_id, x, y))
        val d = ImageCodec.decodeBmp(bytes)
        val (sr, sg, sb, ck) = ImageCodec.planeStats(d, T.HashMod)
        BmpStats(m.media_id, d.width, d.height, bytes.length.toLong,
          sr, sg, sb, ck)
      }
    }
  }

  val decodeBmpStats: Q = Q(
    "mm_decode_bmp_stats",
    (s, dir) => {
      import s.implicits._
      bmpStatsStage(mediaSpecs(s, dir).as[MediaSpec])
        .toDF()
    },
    Some(
      s"""WITH $ddbPixels
         |SELECT media_id,
         |       CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
         |       CAST(54 + ((3 * MAX(w) + 3) // 4) * 4 * MAX(h) AS BIGINT) AS n_bytes,
         |       CAST(SUM(r) AS BIGINT) AS sum_r,
         |       CAST(SUM(g) AS BIGINT) AS sum_g,
         |       CAST(SUM(b) AS BIGINT) AS sum_b,
         |       CAST(SUM((r + 2 * g + 3 * b) * (1 + x + y * w)) % ${T.HashMod} AS BIGINT) AS checksum
         |FROM f GROUP BY media_id
         |ORDER BY media_id""".stripMargin))

  /** REAL PNG decode: the same pixel truth round-tripped through the
    * JDK's actual PNG pipeline — deflate compression, scanline filters,
    * chunk framing — via encode → decode in one mapPartitions stage.
    * PNG is lossless, so the decoded statistics must equal the SAME
    * closed-form oracle as the BMP query (container bytes are
    * encoder-dependent and deliberately unhashed). Passing proves a
    * real compressed codec ran: corrupt one deflate byte and the decode
    * throws; mis-scale one pixel and the checksum breaks. */
  val decodePngStats: Q = Q(
    "mm_decode_png_stats",
    (s, dir) => {
      import s.implicits._
      mediaSpecs(s, dir).as[MediaSpec]
        .mapPartitions { rows =>
          rows.map { m =>
            val bytes = ImageCodec.encodePng(m.width, m.height,
              (x, y) => ImageCodec.synthPixel(m.media_id, x, y))
            val d = ImageCodec.decodePng(bytes)
            val (sr, sg, sb, ck) = ImageCodec.planeStats(d, T.HashMod)
            PngStats(m.media_id, d.width, d.height, sr, sg, sb, ck)
          }
        }
        .toDF()
    },
    Some(
      s"""WITH $ddbPixels
         |SELECT media_id,
         |       CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
         |       CAST(SUM(r) AS BIGINT) AS sum_r,
         |       CAST(SUM(g) AS BIGINT) AS sum_g,
         |       CAST(SUM(b) AS BIGINT) AS sum_b,
         |       CAST(SUM((r + 2 * g + 3 * b) * (1 + x + y * w)) % ${T.HashMod} AS BIGINT) AS checksum
         |FROM f GROUP BY media_id
         |ORDER BY media_id""".stripMargin))

  /** Cross-codec perceptual hash — the decoded-plane answer to "the
    * same picture re-encoded defeats content-hash dedup": every image
    * is encoded BOTH as BMP and as PNG (byte streams differ wildly, so
    * md5-level dedup sees two distinct objects), both are decoded, and
    * the 8×8 integer average-hash ([[ImageCodec.aHash]]) is computed
    * from each plane. codecs_agree asserts the two decodes produce the
    * identical hash — the invariant that makes perceptual dedup work
    * across containers. The hash is emitted as (hi, lo) 32-bit halves
    * so neither engine touches the sign bit of a 2⁶³ term. The oracle
    * recomputes the hash from the pixel formula: 64 samples at
    * (⌊i·w/8⌋, ⌊j·h/8⌋), bit = 64·gray > Σgray, all integer. */
  val ahashCrossCodec: Q = Q(
    "mm_ahash_cross_codec",
    (s, dir) => {
      import s.implicits._
      mediaSpecs(s, dir).as[MediaSpec]
        .mapPartitions { rows =>
          rows.map { m =>
            val pix = (x: Int, y: Int) => ImageCodec.synthPixel(m.media_id, x, y)
            val hb = ImageCodec.aHash(
              ImageCodec.decodeBmp(ImageCodec.encodeBmp(m.width, m.height, pix)))
            val hp = ImageCodec.aHash(
              ImageCodec.decodePng(ImageCodec.encodePng(m.width, m.height, pix)))
            AHashRow(m.media_id, hb >>> 32, hb & 0xffffffffL, hb == hp)
          }
        }
        .toDF()
    },
    Some(
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |         CAST(64 + (doc_id % 8) * 32 AS BIGINT) AS w,
         |         CAST(48 + (doc_id % 5) * 24 AS BIGINT) AS h
         |  FROM documents),
         |s AS (
         |  SELECT media_id, w, h, unnest(generate_series(0, 63)) AS sidx
         |  FROM m),
         |g AS (
         |  SELECT media_id, sidx,
         |         ((sidx % 8) * w) // 8 AS x, ((sidx // 8) * h) // 8 AS y
         |  FROM s),
         |q AS (
         |  SELECT media_id, sidx,
         |         (7 * media_id + 3 * x + 5 * y) % 256 +
         |         (11 * media_id + 2 * x + 7 * y) % 256 +
         |         (13 * media_id + 5 * x + 2 * y) % 256 AS gray
         |  FROM g),
         |t AS (SELECT media_id, CAST(SUM(gray) AS BIGINT) AS total FROM q GROUP BY media_id)
         |SELECT q.media_id,
         |       CAST(SUM(CASE WHEN gray * 64 > total AND sidx >= 32
         |                     THEN CAST(1 AS BIGINT) << (sidx - 32) ELSE 0 END) AS BIGINT) AS ahash_hi,
         |       CAST(SUM(CASE WHEN gray * 64 > total AND sidx < 32
         |                     THEN CAST(1 AS BIGINT) << sidx ELSE 0 END) AS BIGINT) AS ahash_lo,
         |       TRUE AS codecs_agree
         |FROM q JOIN t USING (media_id)
         |GROUP BY q.media_id
         |ORDER BY media_id""".stripMargin))

  // --------------------------------------------- REAL audio decode (r10)

  import graft.multimodal.AudioCodec

  final case class AudioSpec(media_id: Long, sample_rate: Int, n_samples: Int)
  final case class WavStats(
      media_id: Long, sample_rate: Int, n_samples: Long, n_bytes: Long,
      sum_abs: Long, energy: Long, zero_crossings: Long)
  final case class WavWindow(
      media_id: Long, window_idx: Long, n_in_window: Long, energy: Long)

  /** Per-media audio spec: rate ∈ {8, 12, 16} kHz, 2048–8192 samples —
    * derived from doc_id exactly like the image dims. Scattered for the
    * same single-file-scan reason as [[mediaSpecs]]. */
  private def audioSpecs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      (lit(8000) + (col("doc_id") % 3) * 4000).cast("int").as("sample_rate"),
      (lit(2048) + (col("doc_id") % 7) * 1024).cast("int").as("n_samples"))
      .repartition(s.sparkContext.defaultParallelism)

  /** Shared oracle fragment: every (media, t) sample evaluated from the
    * closed-form PCM formula, with the PREVIOUS sample re-evaluated in
    * place (no window function — the crossing predicate is pure
    * arithmetic on both engines). */
  private val ddbSamples =
    """a AS (
      |  SELECT doc_id AS media_id,
      |         CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
      |         CAST(2048 + (doc_id % 7) * 1024 AS BIGINT) AS n
      |  FROM documents),
      |ts AS (
      |  SELECT media_id, sample_rate, n, unnest(generate_series(0, n - 1)) AS t
      |  FROM a),
      |s AS (
      |  SELECT media_id, sample_rate, n, t,
      |         (31 * media_id + 17 * t) % 65536 - 32768 AS s,
      |         CASE WHEN t > 0
      |              THEN (31 * media_id + 17 * (t - 1)) % 65536 - 32768 END AS prev
      |  FROM ts)""".stripMargin

  /** REAL WAV decode: each row builds an actual RIFF/WAVE container
    * (16-bit PCM mono, synthetic sawtooth samples), walks the chunk
    * list back — fmt geometry, data offset, s16le sign handling — and
    * reports decoded-sample statistics: Σ|s|, energy Σs², and the
    * zero-crossing count. sample_rate comes from the PARSED fmt chunk
    * and n_bytes is the real container length (gated against the
    * closed-form 44 + 2n), so header layout and sample packing are both
    * checked; a byte-order or sign bug flips every statistic. */
  val decodeWavStats: Q = Q(
    "mm_decode_wav_stats",
    (s, dir) => {
      import s.implicits._
      audioSpecs(s, dir).as[AudioSpec]
        .mapPartitions { rows =>
          rows.map { a =>
            val samples = Array.tabulate(a.n_samples)(t =>
              AudioCodec.synthSample(a.media_id, t))
            val bytes = AudioCodec.encodeWav(a.sample_rate, samples)
            val p = AudioCodec.decodeWav(bytes)
            val (sumAbs, energy, zc) = AudioCodec.pcmStats(p)
            WavStats(a.media_id, p.sampleRate, p.samples.length.toLong,
              bytes.length.toLong, sumAbs, energy, zc)
          }
        }
        .toDF()
    },
    Some(
      s"""WITH $ddbSamples
         |SELECT media_id,
         |       MAX(sample_rate) AS sample_rate,
         |       CAST(MAX(n) AS BIGINT) AS n_samples,
         |       CAST(44 + 2 * MAX(n) AS BIGINT) AS n_bytes,
         |       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
         |       CAST(SUM(s * s) AS BIGINT) AS energy,
         |       CAST(SUM(CASE WHEN prev IS NOT NULL AND ((prev >= 0) <> (s >= 0))
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
         |FROM s GROUP BY media_id
         |ORDER BY media_id""".stripMargin))

  /** Windowed audio features off the decoded PCM: 1024-sample frames
    * (last frame partial), per-frame energy — the frame-explosion shape
    * every audio feature extractor (MFCC, VAD, loudness) produces. One
    * flatMap per decoded clip; the exploded rows carry (id, idx, n,
    * energy) only. */
  val wavWindowEnergy: Q = Q(
    "mm_wav_window_energy",
    (s, dir) => {
      import s.implicits._
      audioSpecs(s, dir).as[AudioSpec]
        .flatMap { a =>
          val samples = Array.tabulate(a.n_samples)(t =>
            AudioCodec.synthSample(a.media_id, t))
          val p = AudioCodec.decodeWav(AudioCodec.encodeWav(a.sample_rate, samples))
          p.samples.grouped(1024).zipWithIndex.map { case (win, idx) =>
            WavWindow(a.media_id, idx.toLong, win.length.toLong,
              win.foldLeft(0L)((acc, v) => acc + v.toLong * v))
          }
        }
        .toDF()
    },
    Some(
      s"""WITH $ddbSamples
         |SELECT media_id, CAST(t // 1024 AS BIGINT) AS window_idx,
         |       count(*) AS n_in_window,
         |       CAST(SUM(s * s) AS BIGINT) AS energy
         |FROM s GROUP BY media_id, window_idx
         |ORDER BY media_id, window_idx""".stripMargin))

  final case class ResizeStats(
      media_id: Long, new_width: Int, new_height: Int,
      pooled_total: Long, pooled_checksum: Long)

  /** REAL pixel-level resize: encode → decode → 2×2 box-filter pool
    * over the DECODED planes ([[ImageCodec.boxPool2Stats]]) — the
    * decode-tier completion of the payload-byte mm_resize. Pooled cells
    * carry integer channel sums (no division), so the oracle recomputes
    * them exactly: each pooled cell expands to its 12 closed-form
    * channel samples. A resampling bug — wrong stride, off-by-one crop,
    * mean-instead-of-sum — breaks the hash. */
  val resizeDecoded: Q = Q(
    "mm_resize_decoded",
    (s, dir) => {
      import s.implicits._
      mediaSpecs(s, dir).as[MediaSpec]
        .mapPartitions { rows =>
          rows.map { m =>
            val d = ImageCodec.decodeBmp(ImageCodec.encodeBmp(m.width, m.height,
              (x, y) => ImageCodec.synthPixel(m.media_id, x, y)))
            val (w2, h2, total, ck) = ImageCodec.boxPool2Stats(d, T.HashMod)
            ResizeStats(m.media_id, w2, h2, total, ck)
          }
        }
        .toDF()
    },
    Some {
      def chan(mul: Int, xo: String, yo: String, xs: Int, ys: Int) =
        s"($mul * media_id + $xs * $xo + $ys * $yo) % 256"
      def cell(dx: Int, dy: Int) = {
        val xo = s"(2 * x2 + $dx)"; val yo = s"(2 * y2 + $dy)"
        s"${chan(7, xo, yo, 3, 5)} + ${chan(11, xo, yo, 2, 7)} + ${chan(13, xo, yo, 5, 2)}"
      }
      val cellSum = Seq((0, 0), (1, 0), (0, 1), (1, 1)).map { case (dx, dy) => cell(dx, dy) }
        .mkString("(", " + ", ")")
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |         CAST(64 + (doc_id % 8) * 32 AS BIGINT) AS w,
         |         CAST(48 + (doc_id % 5) * 24 AS BIGINT) AS h
         |  FROM documents),
         |p2 AS (
         |  SELECT media_id, w // 2 AS w2, h // 2 AS h2,
         |         unnest(generate_series(0, (w // 2) * (h // 2) - 1)) AS p
         |  FROM m),
         |c AS (
         |  SELECT media_id, w2, h2, p % w2 AS x2, p // w2 AS y2
         |  FROM p2),
         |s AS (
         |  SELECT media_id, w2, h2, x2, y2, $cellSum AS cell
         |  FROM c)
         |SELECT media_id,
         |       CAST(MAX(w2) AS INT) AS new_width, CAST(MAX(h2) AS INT) AS new_height,
         |       CAST(SUM(cell) AS BIGINT) AS pooled_total,
         |       CAST(SUM(cell * (1 + x2 + y2 * w2)) % ${T.HashMod} AS BIGINT) AS pooled_checksum
         |FROM s GROUP BY media_id
         |ORDER BY media_id""".stripMargin
    })

  // --------------------------------------------- REAL video decode (r10)

  final case class VideoSpec(media_id: Long, width: Int, height: Int, n_frames: Int)
  final case class VideoFrameRow(
      media_id: Long, sample_idx: Long, frame_no: Long, n_frames: Long,
      checksum: Long)

  /** Per-media clip spec: quarter-scale frames (16–72 × 12–36), 1–7
    * frames (the existing n_frames metadata derivation). */
  private def videoSpecs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      (lit(16) + (col("doc_id") % 8) * 8).cast("int").as("width"),
      (lit(12) + (col("doc_id") % 5) * 6).cast("int").as("height"),
      (lit(1) + col("doc_id") % 7).cast("int").as("n_frames"))
      .repartition(s.sparkContext.defaultParallelism)

  /** REAL frame-sampling from a multi-frame container: each row builds
    * a GVID clip (offset-indexed BMP frames, frame f's pixels keyed by
    * media_id·7919 + f), then samples ≤4 evenly-strided frames by
    * SEEKING through the index — skipped frames are never decoded, the
    * property that makes 100 TB video frame-sampling an index walk.
    * n_frames is read from the container header; per-frame checksums
    * come from decoded planes; the oracle recomputes both the stride
    * rule (⌊i·nf/k⌋) and the pixel truth in closed form. */
  val videoFrameStats: Q = Q(
    "mm_video_frame_stats",
    (s, dir) => {
      import s.implicits._
      videoSpecs(s, dir).as[VideoSpec]
        .flatMap { v =>
          val frames = (0 until v.n_frames).map { f =>
            ImageCodec.encodeBmp(v.width, v.height,
              (x, y) => ImageCodec.synthPixel(v.media_id * 7919 + f, x, y))
          }
          val clip = ImageCodec.encodeVideo(frames)
          val nf = ImageCodec.videoFrameCount(clip)
          val k = math.min(nf, 4)
          (0 until k).map { i =>
            val frameNo = i * nf / k
            val d = ImageCodec.decodeVideoFrame(clip, frameNo)
            val (_, _, _, ck) = ImageCodec.planeStats(d, T.HashMod)
            VideoFrameRow(v.media_id, i.toLong, frameNo.toLong, nf.toLong, ck)
          }
        }
        .toDF()
    },
    Some(
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |         CAST(16 + (doc_id % 8) * 8 AS BIGINT) AS w,
         |         CAST(12 + (doc_id % 5) * 6 AS BIGINT) AS h,
         |         CAST(1 + doc_id % 7 AS BIGINT) AS nf
         |  FROM documents),
         |si AS (
         |  SELECT media_id, w, h, nf,
         |         unnest(generate_series(0, least(nf, 4) - 1)) AS i,
         |         least(nf, 4) AS k
         |  FROM m),
         |fr AS (
         |  SELECT media_id, w, h, nf, i, (i * nf) // k AS f FROM si),
         |px AS (
         |  SELECT media_id, w, h, nf, i, f,
         |         media_id * 7919 + f AS fid,
         |         unnest(generate_series(0, w * h - 1)) AS p
         |  FROM fr),
         |c AS (
         |  SELECT media_id, i, f, nf, w, p % w AS x, p // w AS y,
         |         (7 * fid + 3 * (p % w) + 5 * (p // w)) % 256 AS r,
         |         (11 * fid + 2 * (p % w) + 7 * (p // w)) % 256 AS g,
         |         (13 * fid + 5 * (p % w) + 2 * (p // w)) % 256 AS b
         |  FROM px)
         |SELECT media_id, i AS sample_idx, MAX(f) AS frame_no,
         |       CAST(MAX(nf) AS BIGINT) AS n_frames,
         |       CAST(SUM((r + 2 * g + 3 * b) * (1 + x + y * w)) % ${T.HashMod} AS BIGINT) AS checksum
         |FROM c GROUP BY media_id, i
         |ORDER BY media_id, sample_idx""".stripMargin))

  def all: Seq[Q] = Seq(catalog, decodeFeatures, resize, frameSample,
    dedupContent, dedupPerceptual, decodeBmpStats, decodePngStats,
    ahashCrossCodec, decodeWavStats, wavWindowEnergy, videoFrameStats,
    resizeDecoded)
}
