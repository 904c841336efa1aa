package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{TextFunctions => T}

/** Text-analysis operators over the `documents` table (language-ID,
  * quality scoring, token counting, fingerprinting) — each the same
  * engine-agnostic formula in Spark and in the DuckDB oracle. */
object TextQueries {

  private val ddbToks = "regexp_split_to_array(lower(trim(text)), '\\s+')"

  private def ddbLexHits(lex: Seq[String]): String = {
    val l = lex.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($ddbToks, t -> list_contains($l, t)))"
  }

  val tokenCount: Q = Q(
    "text_token_count",
    (s, dir) => table(s, dir, "documents")
      .select(
        col("doc_id"),
        T.tokenCount(col("text")).as("ws_tokens"),
        T.bpeTokenCount(col("text")).as("bpe_tokens"))
      .orderBy("doc_id"),
    Some(
      s"""SELECT doc_id,
         |       len($ddbToks) AS ws_tokens,
         |       len(regexp_extract_all(lower(text), '${T.BpePattern}')) AS bpe_tokens
         |FROM documents
         |ORDER BY doc_id""".stripMargin))

  private val ddbNonSpace = "length(regexp_replace(lower(text), '\\s', '', 'g'))"
  private val ddbPunct =
    "length(regexp_replace(regexp_replace(lower(text), '\\s', '', 'g'), '[a-z0-9]', '', 'g'))"
  private val ddbPunctRatio =
    s"CAST($ddbPunct AS DOUBLE) / greatest(CAST($ddbNonSpace AS DOUBLE), 1.0)"
  private val ddbStopRatio =
    s"CAST(${ddbLexHits(T.Stopwords)} AS DOUBLE) / greatest(CAST(len($ddbToks) AS DOUBLE), 1.0)"
  private val ddbAvgLen =
    s"CAST(list_sum(list_transform($ddbToks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / greatest(CAST(len($ddbToks) AS DOUBLE), 1.0)"

  val qualityScore: Q = Q(
    "text_quality_score",
    (s, dir) => table(s, dir, "documents")
      .select(
        col("doc_id"),
        T.punctRatio(col("text")).as("punct_ratio"),
        T.stopwordRatio(col("text")).as("stopword_ratio"),
        T.avgTokenLen(col("text")).as("avg_token_len"),
        T.qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id"),
    Some(
      s"""SELECT doc_id,
         |       $ddbPunctRatio AS punct_ratio,
         |       $ddbStopRatio AS stopword_ratio,
         |       $ddbAvgLen AS avg_token_len,
         |       (least(CAST(len($ddbToks) AS DOUBLE), 100.0) / 100.0) * 0.25
         |         + (1.0 - least($ddbPunctRatio * 4.0, 1.0)) * 0.25
         |         + least($ddbStopRatio * 4.0, 1.0) * 0.25
         |         + (1.0 - least(abs($ddbAvgLen - 5.0) / 5.0, 1.0)) * 0.25 AS quality_score
         |FROM documents
         |ORDER BY doc_id""".stripMargin))

  val langIdQ: Q = Q(
    "text_lang_id",
    (s, dir) => table(s, dir, "documents")
      .select(
        col("doc_id"),
        col("lang").as("lang_label"),
        T.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id"),
    Some {
      val hits = T.LangLexicons.map { case (lang, lex) => lang -> ddbLexHits(lex) }
      val best = hits.map(_._2).mkString("greatest(", ", ", ")")
      val cases = hits.map { case (lang, h) =>
        s"WHEN $h = $best AND $h > 0 THEN '$lang'"
      }.mkString(" ")
      s"""SELECT doc_id, lang AS lang_label,
         |       CASE $cases ELSE 'und' END AS lang_pred
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    })

  val fingerprint: Q = Q(
    "text_fingerprint",
    (s, dir) => table(s, dir, "documents")
      .select(
        col("doc_id"),
        T.fingerprintMd5(col("text")).as("fp_md5"),
        T.fingerprintRolling(col("text")).as("fp_rolling"))
      .orderBy("doc_id"),
    Some(
      s"""SELECT doc_id,
         |       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_md5,
         |       list_reduce(
         |         list_prepend(CAST(0 AS BIGINT),
         |           list_transform(
         |             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ''),
         |             c -> CAST(ascii(c) AS BIGINT))),
         |         (acc, x) -> (acc * 31 + x) % ${T.HashMod}) AS fp_rolling
         |FROM documents
         |ORDER BY doc_id""".stripMargin))

  def all: Seq[Q] = Seq(tokenCount, qualityScore, langIdQ, fingerprint)
}
