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
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (documented per operator): byte-level arithmetic
  * over the payload stands in for pixel decoding. Everything around it —
  * binary schema, metadata struct, per-partition typed iteration, batch
  * shape, exploded frame rows — is real Spark plumbing, and every
  * operator still hash-matches a DuckDB oracle over the same bytes.
  *
  * The media table is synthesized from `documents`: the UTF-8 text bytes
  * play the payload (ASCII in the testdata, so byte i == ascii(char i)
  * on both engines — the oracles lean on that equivalence).
  */
object MultimodalQueries {

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
      lower(substring(hex(col("payload")), 1, 16)).as("hex_prefix"))
      .orderBy("media_id"),
    Some(
      s"""WITH $ddbMedia
         |SELECT media_id, format, width, height, n_frames,
         |       octet_length(payload) AS n_bytes,
         |       lower(substr(hex(payload), 1, 16)) AS hex_prefix
         |FROM media
         |ORDER BY media_id""".stripMargin))

  /** DECODE (stubbed codec): per-partition typed iteration — the shape a
    * real decoder plugs into (batch of MediaRow in, features out). The
    * "decode" is a deterministic fake: mean byte value and a rolling
    * checksum of the first 64 payload bytes. */
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
        .orderBy("media_id")
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

  /** RESIZE (stubbed codec): halves the declared dims and "re-encodes" by
    * striding every 2nd byte of the first 128 — the Spark side does it
    * with pure array expressions (no UDF). */
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
        .orderBy("media_id")
    },
    Some(
      s"""WITH $ddbMedia
         |SELECT media_id,
         |       CAST(width / 2 AS INT) AS new_width,
         |       CAST(height / 2 AS INT) AS new_height,
         |       ${T.polyHashSql("array_to_string(list_transform(generate_series(1, 64), i -> substr(text, i * 2, 1)), '')")} AS resized_checksum
         |FROM media
         |ORDER BY media_id""".stripMargin))

  /** FRAME-SAMPLE (stubbed codec): up to 4 evenly-strided "frames" per
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
        .orderBy("media_id", "frame_idx")
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
        .orderBy("keeper_id")
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
    * global mean, match on Hamming distance.
    *
    * Decode stub (same seam as [[decodeFeatures]]): 4-byte block sums
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
        .orderBy("i", "j")
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

  def all: Seq[Q] = Seq(catalog, decodeFeatures, resize, frameSample,
    dedupContent, dedupPerceptual)
}
