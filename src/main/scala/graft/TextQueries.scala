package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{TextFunctions => T}
import graft.functions.{HashFunctions => H}

/** Text-analysis operators over the `documents` table (language-ID,
  * quality scoring, token counting, fingerprinting) — each the same
  * engine-agnostic formula in Spark and in the DuckDB oracle. */
object TextQueries {

  import TextOracleSql.{toks => ddbToks}
  private def ddbLexHits(lex: Seq[String]): String = TextOracleSql.lexHits(lex)

  val tokenCount: Q = Q(
    "text_token_count",
    (s, dir) => table(s, dir, "documents")
      .select(
        col("doc_id"),
        T.tokenCount(col("text")).as("ws_tokens"),
        T.bpeTokenCount(col("text")).as("bpe_tokens")),
    // no output sorts on the per-doc scorers in this file (r14): the
    // gate hashes order-insensitively and a trailing ORDER BY makes the
    // range partitioner's sampling pass run the scorer twice
    Some(
      s"""SELECT doc_id,
         |       len($ddbToks) AS ws_tokens,
         |       len(regexp_extract_all(lower(text), '${T.BpePattern}')) AS bpe_tokens
         |FROM documents
         |ORDER BY doc_id""".stripMargin))

  private val ddbPunctRatio = TextOracleSql.punctRatio
  private val ddbStopRatio = TextOracleSql.stopRatio
  private val ddbAvgLen = TextOracleSql.avgLen

  // No output sort on the per-doc scorer queries (r13 decade-2 finding):
  // the gate hashes order-insensitively, and a trailing global ORDER BY
  // makes the range partitioner's sampling pass evaluate the whole
  // scorer twice — text_lang_id measured 2x its confusion-matrix twin
  // at sf1 for no semantic difference (PERF.md r13 scaling bucket 3).
  val qualityScore: Q = Q(
    "text_quality_score",
    // Two-step projection = tokens-once across all four output columns:
    // __st/__punct are non-cheap aliases referenced more than once, so
    // CollapseProject (SPARK-36718 cost check) keeps them materialized
    // instead of re-inlining one fold per metric (r14 verdict task 1).
    (s, dir) => table(s, dir, "documents")
      .select(
        col("doc_id"),
        T.tokenStats(col("text")).as("__st"),
        T.punctRatio(col("text")).as("__punct"))
      .select(
        col("doc_id"),
        col("__punct").as("punct_ratio"),
        T.stopwordRatioFrom(col("__st")).as("stopword_ratio"),
        T.avgTokenLenFrom(col("__st")).as("avg_token_len"),
        T.qualityScoreFrom(col("__st"), col("__punct")).as("quality_score")),
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
        T.langId(col("text")).as("lang_pred")),
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

  /** Language × source data-mix report — the dashboard table every
    * pretraining-mix decision reads (what share of docs/tokens each
    * (language, source) cell contributes): predicted language via the
    * shared lexicon scorer, exact-integer doc/token counts, shares
    * divided once in DOUBLE at the end. One map-side-combining groupBy
    * over the corpus (the per-row scorer is the same codegen'd lexicon
    * expression `text_lang_id` gates); the mix table is ≤
    * |langs|·|sources| rows and the totals attach via a broadcast
    * 1-row aggregate. */
  val langMix: Q = Q(
    "text_lang_mix",
    (s, dir) => {
      val agg = table(s, dir, "documents")
        .select(T.langId(col("text")).as("lang_pred"), col("source"),
          T.tokenCount(col("text")).as("nt"))
        .groupBy(col("lang_pred"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).cast("long").as("n_tokens"))
      val tot = agg.agg(sum(col("n_docs")).as("td"), sum(col("n_tokens")).as("tt"))
      agg.crossJoin(broadcast(tot))
        .select(col("lang_pred"), col("source"), col("n_docs"), col("n_tokens"),
          (col("n_docs").cast("double") / col("td").cast("double"))
            .as("doc_share"),
          (col("n_tokens").cast("double") / col("tt").cast("double"))
            .as("token_share"))
        .orderBy("lang_pred", "source")
    },
    Some {
      val hits = T.LangLexicons.map { case (lang, lex) => lang -> ddbLexHits(lex) }
      val best = hits.map(_._2).mkString("greatest(", ", ", ")")
      val cases = hits.map { case (lang, h) =>
        s"WHEN $h = $best AND $h > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH m AS (
         |  SELECT CASE $cases ELSE 'und' END AS lang_pred, source,
         |         len($ddbToks) AS nt
         |  FROM documents),
         |a AS (
         |  SELECT lang_pred, source, count(*) AS n_docs,
         |         CAST(sum(nt) AS BIGINT) AS n_tokens
         |  FROM m GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
         |             CAST(sum(n_tokens) AS BIGINT) AS tt FROM a)
         |SELECT lang_pred, source, n_docs, n_tokens,
         |       CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE) AS doc_share,
         |       CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS token_share
         |FROM a, t
         |ORDER BY lang_pred, source""".stripMargin
    })

  /** Language-ID confusion matrix — the evaluation table behind the
    * classifier `text_lang_id` gates row-by-row: per (true label,
    * predicted) doc counts plus each cell's share of its true-label
    * row (the per-class recall diagonal and where the misses go). The
    * corpus folds map-side to ≤|langs|² rows; row totals attach via a
    * broadcast of the tiny per-label aggregate. */
  val langConfusion: Q = Q(
    "text_lang_confusion",
    (s, dir) => {
      val cells = table(s, dir, "documents")
        .select(col("lang").as("lang_label"),
          T.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_label"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
      val rowTot = cells.groupBy(col("lang_label"))
        .agg(sum(col("n_docs")).as("n_label"))
      cells.join(broadcast(rowTot), Seq("lang_label"))
        .select(col("lang_label"), col("lang_pred"), col("n_docs"),
          (col("n_docs").cast("double") / col("n_label").cast("double"))
            .as("label_share"))
        .orderBy("lang_label", "lang_pred")
    },
    Some {
      val hits = T.LangLexicons.map { case (lang, lex) => lang -> ddbLexHits(lex) }
      val best = hits.map(_._2).mkString("greatest(", ", ", ")")
      val cases = hits.map { case (lang, h) =>
        s"WHEN $h = $best AND $h > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH cells AS (
         |  SELECT lang AS lang_label,
         |         CASE $cases ELSE 'und' END AS lang_pred,
         |         count(*) AS n_docs
         |  FROM documents GROUP BY 1, 2),
         |t AS (SELECT lang_label, CAST(sum(n_docs) AS BIGINT) AS n_label
         |      FROM cells GROUP BY 1)
         |SELECT c.lang_label, c.lang_pred, c.n_docs,
         |       CAST(c.n_docs AS DOUBLE) / CAST(t.n_label AS DOUBLE) AS label_share
         |FROM cells c JOIN t USING (lang_label)
         |ORDER BY lang_label, lang_pred""".stripMargin
    })

  val fingerprint: Q = Q(
    "text_fingerprint",
    (s, dir) => table(s, dir, "documents")
      .select(
        col("doc_id"),
        T.fingerprintMd5(col("text")).as("fp_md5"),
        T.fingerprintRolling(col("text")).as("fp_rolling")),
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

  /** PII/boilerplate redaction: emails, URLs, phone numbers → tags. The
    * testdata text is clean word salad, so the interesting cases are
    * planted deterministically (every 9th doc gets a contact footer). */
  val redact: Q = Q(
    "text_redact_pii",
    (s, dir) => table(s, dir, "documents")
      .withColumn("text_in",
        when(col("doc_id") % 9 === 0,
          concat(col("text"),
            lit(" contact bob@example.com or https://ex.org/x?a=1 or 555-867-5309 now")))
          .otherwise(col("text")))
      // redact once: the 3-regex chain lands in a non-cheap alias read
      // by both output columns instead of running twice per row
      .select(col("doc_id"), col("text_in"),
        T.redactPii(col("text_in")).as("text_redacted"))
      .select(
        col("doc_id"),
        col("text_redacted"),
        (length(col("text_in")) - length(col("text_redacted")))
          .as("chars_removed")),
    Some {
      val textIn =
        "CASE WHEN doc_id % 9 = 0 THEN text || ' contact bob@example.com or https://ex.org/x?a=1 or 555-867-5309 now' ELSE text END"
      s"""SELECT doc_id,
         |       ${T.redactPiiSql(textIn)} AS text_redacted,
         |       length($textIn) - length(${T.redactPiiSql(textIn)}) AS chars_removed
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    })

  /** Repetition scoring (C4/Gopher-style quality rule): the fraction of
    * a doc's 3-gram instances occupied by its single most frequent
    * 3-gram — near-1 means the doc is one phrase on loop. Distributed as
    * explode → per-(doc, gram) count → per-doc max/sum. */
  val repetition: Q = Q(
    "text_repetition",
    (s, dir) => {
      // all 3-gram instances (NOT distinct — multiplicity is the point),
      // positional form via the native ordered shingle kernel — measured
      // neutral (0.72→0.65 s) but one shared formula across consumers
      val grams = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(H.orderedShingleHashesOfTokens(T.tokens(col("text"))))
            .as("g"))
      grams
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(
          max(col("c")).as("top_gram_count"),
          sum(col("c")).as("n_grams"))
        .withColumn("repetition_ratio",
          col("top_gram_count").cast("double") / col("n_grams").cast("double"))
    },
    Some(
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
         |th AS (SELECT doc_id, list_transform(t, tok -> ${T.polyHashSql("tok")}) AS hs FROM toks),
         |grams AS (
         |  SELECT doc_id, unnest(${H.orderedShingleHashesSql()}) AS g
         |  FROM th),
         |pc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
         |SELECT doc_id, max(c) AS top_gram_count, CAST(sum(c) AS BIGINT) AS n_grams,
         |       CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS repetition_ratio
         |FROM pc GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin))

  /** Per-source quality distribution — what a curation run actually
    * reports per corpus slice: doc count and exact rank-based quantiles
    * (min / lower-median / p90 / max) of the quality score. Quantiles
    * are picked by row_number over (quality, doc_id) — fully
    * deterministic and bit-identical across engines, unlike
    * interpolated percentile_approx/quantile_cont whose float paths
    * differ. One shuffle on source; the rank window shares it. */
  val qualityBySource: Q = Q(
    "text_quality_by_source",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          T.qualityScore(col("text")).as("q"))
      val bySource = Window.partitionBy(col("source"))
      val ranked = scored
        .withColumn("rn", row_number().over(bySource.orderBy(col("q"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(bySource))
      ranked.groupBy(col("source"))
        .agg(
          max(col("n")).as("n_docs"),
          min(col("q")).as("min_q"),
          min(when(col("rn") === ((col("n") + 1) / 2).cast("long"), col("q")))
            .as("median_q"),
          min(when(col("rn") === ((col("n") * 9 + 9) / 10).cast("long"), col("q")))
            .as("p90_q"),
          max(col("q")).as("max_q"))
        .orderBy("source")
    },
    Some(
      s"""WITH s AS (SELECT source, doc_id, ${TextOracleSql.quality} AS q FROM documents),
         |r AS (SELECT source, q,
         |        row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY source) AS n
         |      FROM s)
         |SELECT source,
         |       CAST(max(n) AS BIGINT) AS n_docs,
         |       min(q) AS min_q,
         |       min(CASE WHEN rn = (n + 1) // 2 THEN q END) AS median_q,
         |       min(CASE WHEN rn = (9 * n + 9) // 10 THEN q END) AS p90_q,
         |       max(q) AS max_q
         |FROM r GROUP BY source
         |ORDER BY source""".stripMargin))

  /** Vocabulary building — the first step of tokenizer training (and of
    * any count-based LM table): corpus-wide term and document
    * frequencies, top 200 terms. Two-level aggregate on purpose: the
    * (token, doc) pre-aggregate gives df without a countDistinct
    * (which would plan an Expand over the exploded tokens — the
    * dq_profile lesson), and the second level shuffles only distinct
    * (token, doc) pairs after map-side combine. The top-k is a total
    * order (tf desc, token asc), so the limit is deterministic. */
  val vocab: Q = Q(
    "text_vocab",
    (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("tok")).agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("tok").asc)
      .limit(200),
    Some(
      s"""SELECT tok, CAST(SUM(tf) AS BIGINT) AS tf, COUNT(*) AS df FROM (
         |  SELECT tok, doc_id, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($ddbToks) AS tok FROM documents)
         |  GROUP BY tok, doc_id)
         |GROUP BY tok
         |ORDER BY tf DESC, tok ASC
         |LIMIT 200""".stripMargin))

  /** Gopher quality rules (Rae et al. 2021, arXiv:2112.11446, table A1 —
    * the published web-corpus filter recipe): word-count bounds, mean
    * word length bounds, symbol-to-word ratio, alphabetic-word ratio,
    * and required-stopword presence, each reported per document with
    * the composite keep verdict. The paper's line-based rules (bullet /
    * ellipsis line ratios) are omitted: the harness documents are
    * single-line (they would pass trivially). Every metric is a column
    * expression over one scan — embarrassingly parallel at any scale. */
  val gopherRules: Q = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopsSql = stops.map(s => s"'$s'").mkString("[", ", ", "]")
    Q(
      "text_gopher_rules",
      (s, dir) => {
        // tokens-once (r14 verdict task 1): the split lands in a __toks
        // alias referenced by every metric — CollapseProject's cost
        // check keeps the non-cheap alias materialized, so the row is
        // tokenized once, not once per rule.
        val toks = col("__toks")
        val n = size(toks).cast("double")
        val meanLen = T.avgTokenLenOf(toks)
        val symbolRatio =
          regexp_count(lower(col("text")), lit("#|\\.\\.\\.")).cast("double") /
            greatest(n, lit(1.0))
        val alphaRatio =
          size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
            greatest(n, lit(1.0))
        val stopHits = size(array_intersect(array_distinct(toks),
          typedlit(stops)))
        table(s, dir, "documents")
          .select(col("doc_id"), col("text"), T.tokens(col("text")).as("__toks"))
          .select(col("doc_id"),
            size(toks).cast("long").as("n_words"),
            meanLen.as("mean_word_len"),
            symbolRatio.as("symbol_ratio"),
            alphaRatio.as("alpha_word_ratio"),
            stopHits.cast("long").as("stop_hits"))
          // per-rule verdicts, then the composite: on this harness corpus
          // the stopword rule fails everywhere (the synthetic vocabulary
          // carries only 'the' from the required list), so the composite
          // alone would be a degenerate all-False column — the individual
          // flags keep every rule's boundary genuinely exercised
          // (pass_words varies with the 30–90-token doc lengths)
          .withColumn("pass_words", col("n_words").between(50, 100000))
          .withColumn("pass_mean_len", col("mean_word_len").between(3.0, 10.0))
          .withColumn("pass_symbols", col("symbol_ratio") <= 0.1)
          .withColumn("pass_alpha", col("alpha_word_ratio") >= 0.8)
          .withColumn("pass_stops", col("stop_hits") >= 2)
          .withColumn("keep",
            col("pass_words") && col("pass_mean_len") && col("pass_symbols") &&
              col("pass_alpha") && col("pass_stops"))
          // no output sort: per-doc scorer, gate hashes order-insensitively;
          // a trailing ORDER BY would double-evaluate the rules via the
          // range partitioner's sampling pass (r13 decade-2 finding)
      },
      Some(
        s"""WITH m AS (
           |  SELECT doc_id,
           |         CAST(len($ddbToks) AS BIGINT) AS n_words,
           |         CAST(list_sum(list_transform($ddbToks, t -> len(t))) AS DOUBLE)
           |           / GREATEST(CAST(len($ddbToks) AS DOUBLE), 1.0) AS mean_word_len,
           |         CAST(len(regexp_extract_all(lower(text), '#|\\.\\.\\.')) AS DOUBLE)
           |           / GREATEST(CAST(len($ddbToks) AS DOUBLE), 1.0) AS symbol_ratio,
           |         CAST(len(list_filter($ddbToks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
           |           / GREATEST(CAST(len($ddbToks) AS DOUBLE), 1.0) AS alpha_word_ratio,
           |         CAST(len(list_intersect(list_distinct($ddbToks), $stopsSql)) AS BIGINT) AS stop_hits
           |  FROM documents)
           |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
           |       stop_hits,
           |       (n_words BETWEEN 50 AND 100000) AS pass_words,
           |       (mean_word_len BETWEEN 3.0 AND 10.0) AS pass_mean_len,
           |       (symbol_ratio <= 0.1) AS pass_symbols,
           |       (alpha_word_ratio >= 0.8) AS pass_alpha,
           |       (stop_hits >= 2) AS pass_stops,
           |       (n_words BETWEEN 50 AND 100000
           |        AND mean_word_len BETWEEN 3.0 AND 10.0
           |        AND symbol_ratio <= 0.1
           |        AND alpha_word_ratio >= 0.8
           |        AND stop_hits >= 2) AS keep
           |FROM m
           |ORDER BY doc_id""".stripMargin))
  }

  /** Threshold-free quality gating: an absolute quality cutoff tuned on
    * one source misfires on another (a transcript corpus scores
    * systematically lower than an encyclopedia corpus), so real
    * curation gates on the WITHIN-SOURCE percentile instead — keep the
    * top 30% of every source. percent_rank = (rank−1)/(n−1) over
    * (quality, doc_id) is rank-based and fully tie-broken, so the
    * double is the same exact division on both engines — no
    * interpolated-quantile float drift (same rationale as
    * [[qualityBySource]]). One shuffle on source; at 100 TB a source is
    * a domain slice, and skewed giant sources remain a single-partition
    * window — [[qualityKeepHist]] is the same contract without that
    * window (per-source quantized-histogram boundary location), under
    * the same oracle. */
  val qualityRank: Q = Q(
    "text_quality_rank",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("q"), col("doc_id"))
      table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.qualityScore(col("text")).as("q"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("keep", col("pr") >= 0.7)
    },
    Some(
      s"""WITH s AS (
         |  SELECT doc_id, source, ${TextOracleSql.quality} AS q FROM documents),
         |r AS (SELECT doc_id, source, q,
         |        percent_rank() OVER (PARTITION BY source ORDER BY q, doc_id) AS pr
         |      FROM s)
         |SELECT doc_id, source, q, pr, pr >= 0.7 AS keep
         |FROM r
         |ORDER BY doc_id""".stripMargin))

  /** [[qualityRank]]'s scale twin: the same keep-top-30%-of-every-
    * source contract, computed WITHOUT any per-source total-order
    * window — the formulation a 100× skewed source needs (a giant
    * domain slice turns qualityRank's partitionBy(source) window into
    * one task; here a source only ever contributes ≤10001 histogram
    * rows and a boundary-bin sliver).
    *
    * Shape (per-source version of [[qualityNtile]]'s boundary
    * location): quantize q ∈ [0,1] to 10⁴ bins; per-(source, bin)
    * counts cumulate in a window over the tiny histogram; the keep
    * threshold rank r* = the smallest rank with
    * (rank−1)/(n−1) ≥ 0.7, derived in EXACT integer arithmetic
    * (10·(r−1) ≥ 7·(n−1) — no float 0.7 ever meets a float division;
    * ranks at denominator n are ≥1/n apart, far outside double
    * rounding range of the oracle's percent_rank compare, and the
    * exact-equality boundary agrees on both engines). Whole bins
    * classify as keep-all / drop-all by comparing their rank range to
    * r*; ONLY the one boundary bin per source needs a row_number, over
    * its own ≤ n/10⁴-expected rows. Single-row sources pin keep =
    * false (percent_rank of a lone row is 0). The oracle is the
    * RANK-WINDOW formulation — crossing formulations, not just
    * engines. */
  val qualityKeepHist: Q = Q(
    "text_quality_keep_hist",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.qualityScore(col("text")).as("q"))
        .withColumn("bin", floor(col("q") * 10000).cast("long"))
        .persist()
      val cumW = Window.partitionBy(col("source")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nW = Window.partitionBy(col("source"))
      val bins = d.groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(cumW))
        .withColumn("cum_before", col("cum") - col("c"))
        .withColumn("n", sum(col("c")).over(nW))
        .withColumn("rstar",
          expr("(7 * (n - 1) + 9) DIV 10 + 1"))
        .select(col("source"), col("bin"), col("cum_before"), col("n"),
          col("rstar"),
          (col("cum_before") + 1 >= col("rstar")).as("keep_all"),
          (col("cum") < col("rstar")).as("drop_all"))
      val classified = d.join(bins, Seq("source", "bin"))
      val whole = classified
        .filter(col("keep_all") || col("drop_all"))
        .select(col("doc_id"), col("source"), col("q"),
          (col("keep_all") && col("n") > 1).as("keep"))
      val rnW = Window.partitionBy(col("source"), col("bin"))
        .orderBy(col("q"), col("doc_id"))
      val boundary = classified
        .filter(!col("keep_all") && !col("drop_all"))
        .withColumn("rn", row_number().over(rnW))
        .select(col("doc_id"), col("source"), col("q"),
          (col("cum_before") + col("rn") >= col("rstar") && col("n") > 1)
            .as("keep"))
      whole.unionByName(boundary)
    },
    Some(
      s"""WITH s AS (
         |  SELECT doc_id, source, ${TextOracleSql.quality} AS q FROM documents),
         |r AS (SELECT doc_id, source, q,
         |        percent_rank() OVER (PARTITION BY source ORDER BY q, doc_id) AS pr
         |      FROM s)
         |SELECT doc_id, source, q, pr >= 0.7 AS keep
         |FROM r
         |ORDER BY doc_id""".stripMargin))

  /** Equi-depth quality histogram: exact ntile(10) deciles over the
    * fully tie-broken (quality, doc_id) order, summarized per decile
    * (count + exact min/max bounds) — WITHOUT the global
    * single-partition window (the round-6 scale-killer; this is the
    * two-pass histogram cutoff [[qualityRank]]'s scaladoc promised).
    * The quality score is ∈ [0,1] by construction (four clamped
    * quarter-terms), so the corpus compresses to a bounded quantized
    * histogram: bin = floor(q·10⁴) is ≤ 10001 rows at ANY corpus size.
    * Cumulative bin counts (a window over the tiny histogram,
    * constant-partitioned so no unpartitioned WindowExec exists in the
    * plan — asserted by PlanShapeSpec) locate, for each of the 9 ntile
    * boundary ranks (bucket k ends at k·⌊n/10⌋ + min(k, n mod 10) —
    * the exact ntile split), the bin holding that rank and the rank's
    * offset inside the bin; a PER-BIN row_number over only the ≤ 9
    * boundary bins (expected n/10⁴ rows each; degenerate only if every
    * score lands in one bin) resolves each offset to its concrete
    * boundary row (q, doc_id). The 9 boundary tuples broadcast back
    * and a row's decile is 1 + #boundaries lexicographically below it
    * — bit-identical to ntile's assignment. Corpus-side cost: one
    * groupBy(bin) shuffle + one broadcast join; the (doc_id, q, bin)
    * projection is persisted across the three passes so the
    * regex-heavy score is computed once (harness clears cache between
    * queries — Registry scaladoc). */
  val qualityNtile: Q = Q(
    "text_quality_ntile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val d = table(s, dir, "documents")
        .select(col("doc_id"), T.qualityScore(col("text")).as("q"))
        .withColumn("bin", floor(col("q") * 10000).cast("long"))
        .persist()
      val n = d.count()
      // exact ntile bucket-end ranks (k = 1..9)
      val q0 = n / 10
      val r = n % 10
      val ends = (1 to 9).map(k => (k, k * q0 + math.min(k.toLong, r)))
        .toDF("k", "ek")
      // single-group cumulative over the ≤10001-row histogram; the
      // partition key must be non-foldable (a lit would constant-fold
      // into an EMPTY partition spec = the WindowExec all-data-one-
      // partition warning), so derive the constant from the column
      val cumW = Window.partitionBy(pmod(col("bin"), lit(1))).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = d.groupBy(col("bin")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(cumW))
        .withColumn("cum_before", col("cum") - col("c"))
      // the bin holding each boundary rank ek, and ek's offset inside it
      val bk = broadcast(ends).join(cum,
          col("cum") >= col("ek") && col("cum_before") < col("ek"))
        .select(col("k"), col("bin").as("bbin"),
          (col("ek") - col("cum_before")).as("off"))
      // resolve offsets to concrete boundary rows (windows only per-bin)
      val rnW = Window.partitionBy(col("bin")).orderBy(col("q"), col("doc_id"))
      val bpts = d
        .join(broadcast(bk.select(col("bbin")).distinct()),
          col("bin") === col("bbin"))
        .drop("bbin")
        .withColumn("rn", row_number().over(rnW))
        .join(broadcast(bk),
          col("bin") === col("bbin") && col("rn") === col("off"))
        .agg(collect_list(struct(col("q").as("bq"), col("doc_id").as("bid")))
          .as("bs"))
      // decile = 1 + #boundary rows strictly below (q, doc_id)
      d.crossJoin(broadcast(bpts))
        .withColumn("decile",
          (lit(1) + size(filter(col("bs"), b =>
            b("bq") < col("q") ||
              (b("bq") === col("q") && b("bid") < col("doc_id")))))
            .cast("int"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("q")).as("min_q"), max(col("q")).as("max_q"))
        .orderBy("decile")
    },
    Some(
      s"""WITH s AS (
         |  SELECT doc_id, ${TextOracleSql.quality} AS q FROM documents),
         |d AS (SELECT doc_id, q,
         |        ntile(10) OVER (ORDER BY q, doc_id) AS decile
         |      FROM s)
         |SELECT decile, count(*) AS n, min(q) AS min_q, max(q) AS max_q
         |FROM d
         |GROUP BY decile
         |ORDER BY decile""".stripMargin))

  /** Per-document n-gram novelty against everything ingested BEFORE it
    * (doc_id as ingest order): the fraction of a document's distinct
    * 3-gram shingles whose first appearance in the corpus is the
    * document itself. The data-curation ordering signal behind
    * "deduplicate forward" policies: a near-zero novelty doc adds
    * nothing the corpus hasn't seen; a high-novelty doc is fresh
    * content even if it shares boilerplate.
    *
    * Scale shape: shingles travel as 64-bit hashes (the dedup family's
    * shared kernel); the first-seer table is one map-side-combining
    * min() per shingle, and the postings⋈first-seer join shuffles on
    * the SAME shingle-hash key the aggregation just produced, so the
    * exchange is reused rather than re-partitioned. The per-doc rollup
    * then folds to one row per document. No pairwise joins anywhere —
    * cost is O(postings), not O(pairs), which is what lets this run
    * over a full 100 TB corpus where the Jaccard pair queries run on
    * candidate subsets. Docs under 3 tokens have no shingles and no
    * row (mirrored by the oracle building from the same index). */
  val noveltyNgram: Q = Q(
    "text_novelty_ngram",
    (s, dir) => {
      val ix = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(H.shingleHashesOfTokens(T.tokens(col("text")))).as("h"))
      val firstSeen = ix.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      ix.join(firstSeen, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_shingles").cast("double"))
            .as("novelty"))
    },
    Some(
      s"""WITH ix AS (
         |  SELECT doc_id, unnest(s) AS h FROM (
         |    SELECT doc_id, ${H.shingleHashesSql("hs")} AS s FROM (
         |      SELECT doc_id, list_transform($ddbToks, tok -> ${T.polyHashSql("tok")}) AS hs
         |      FROM documents))),
         |f AS (SELECT h, min(doc_id) AS first_doc FROM ix GROUP BY h)
         |SELECT ix.doc_id, count(*) AS n_shingles,
         |       CAST(sum(CASE WHEN ix.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       CAST(sum(CASE WHEN ix.doc_id = f.first_doc THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
         |FROM ix JOIN f USING (h)
         |GROUP BY ix.doc_id
         |ORDER BY doc_id""".stripMargin))

  /** Coverage-curve cut points (vocabulary sizes to evaluate). */
  private val CoverageKs = Seq(10L, 100L, 1000L)

  /** Vocabulary coverage curve — the tokenizer-design table: what
    * fraction of all token OCCURRENCES the top-k most frequent terms
    * cover, at k = 10/100/1000. A corpus whose top-1000 covers 99%
    * tokenizes compactly; a long tail argues for subword units.
    *
    * Scale shape: term counts fold map-side (one groupBy over the
    * token explode); the ranked cut reduces through the bounded-heap
    * top-k aggregate (≤ max-k (score, id) pairs per partition cross
    * the shuffle — no rank window over the vocabulary, whose size
    * grows with the corpus); coverage sums then run over the ≤ max-k
    * exploded heap rows and the total attaches as a broadcast 1-row
    * aggregate. Count ties at a cut boundary contribute identical
    * counts to the sum, so the heap's id tie-break (term hash) cannot
    * perturb the output even when the boundary is tied — which is what
    * lets the oracle rank by (count, term) instead of (count, hash)
    * and still hash-match. */
  val ngramCoverage: Q = Q(
    "text_ngram_coverage",
    (s, dir) => {
      val maxK = CoverageKs.max.toInt
      val tc = table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
      val tot = tc.agg(sum(col("c")).as("total"))
      val exploded = tc.groupBy()
        .agg(H.topKByScore(col("c").cast("double"), T.polyHash(col("term")), maxK)
          .as("top"))
        .select(posexplode(col("top")).as(Seq("pos", "p")))
      val covCols = CoverageKs.map(k =>
        sum(when(col("pos") < k, col("p.score")).otherwise(lit(0.0)))
          .cast("long").as(s"cov$k"))
      exploded.agg(covCols.head, covCols.tail: _*)
        .crossJoin(broadcast(tot))
        .select(
          explode(array(CoverageKs.map(k =>
            struct(lit(k).as("k"), col(s"cov$k").as("covered_tokens"))): _*))
            .as("kv"),
          col("total"))
        .select(col("kv.k").as("k"),
          col("kv.covered_tokens").as("covered_tokens"),
          col("total").as("total_tokens"),
          (col("kv.covered_tokens").cast("double") / col("total").cast("double"))
            .as("coverage"))
        .orderBy("k")
    },
    Some {
      val ks = CoverageKs.mkString("[", ", ", "]")
      s"""WITH tok AS (SELECT unnest($ddbToks) AS term FROM documents),
         |tc AS (
         |  SELECT term, count(*) AS c FROM tok
         |  WHERE length(term) > 0 GROUP BY term),
         |tot AS (SELECT sum(c) AS total FROM tc),
         |r AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rk
         |  FROM tc)
         |SELECT CAST(ks.k AS BIGINT) AS k,
         |       CAST(sum(CASE WHEN r.rk <= ks.k THEN r.c ELSE 0 END) AS BIGINT) AS covered_tokens,
         |       CAST((SELECT total FROM tot) AS BIGINT) AS total_tokens,
         |       CAST(sum(CASE WHEN r.rk <= ks.k THEN r.c ELSE 0 END) AS DOUBLE)
         |         / CAST((SELECT total FROM tot) AS DOUBLE) AS coverage
         |FROM r CROSS JOIN (SELECT unnest($ks) AS k) ks
         |GROUP BY ks.k
         |ORDER BY k""".stripMargin
    })

  /** Zipf curve cap: ranks examined are 1..2^12. */
  private val ZipfTopN = 4096

  /** Power-law (Zipf) curve of the term-frequency distribution — the
    * corpus-health check that catches template spam (too-steep head) or
    * tokenizer breakage (too-flat head). Deliberately NOT a fitted
    * log-log slope: ln() is libm, whose last-ulp behavior is engine-
    * specific (same reasoning as the HLL linear-counting branch in
    * SketchQueries), so the operator emits the curve at power-of-two
    * ranks — freq(r) and the dyadic decay ratio freq(r)/freq(2r), an
    * exact integer division in double — and leaves the log to the
    * consumer. A Zipf-α corpus has ratio ≈ 2^α at every r: the whole
    * fit is readable off the 12 rows.
    *
    * Scale shape: the vocabulary fold is one map-side-combining
    * groupBy; only the top [[ZipfTopN]] terms (ORDER BY + LIMIT — a
    * distributed top-K, never a global sort of the vocabulary) meet the
    * row_number window, which therefore runs on a bounded 4096-row
    * frame. The dyadic pairing is a self-join of 12 rows. */
  val zipfCurve: Q = Q(
    "text_zipf_curve",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // non-foldable constant partition key over the bounded top-K
      // frame. The trendMovingAvg `key * 0` idiom does NOT work here:
      // tf is count(*) output, hence non-nullable, and Catalyst folds
      // non-nullable x*0 to the literal 0, dropping the partition spec
      // and re-triggering the WindowExec warning (measured). pmod(tf,1)
      // is constant-valued but has no simplification rule.
      val w = Window.partitionBy(pmod(col("tf"), lit(1)))
        .orderBy(col("tf").desc, col("tok").asc)
      val top = table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("tok").asc).limit(ZipfTopN)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank").bitwiseAND(col("rank") - 1) === 0)
        .select(col("rank"), col("tok"), col("tf"))
      top.alias("a")
        .join(top.alias("b"), col("a.rank") * 2 === col("b.rank"))
        .select(col("a.rank").as("rank"), col("a.tok").as("tok"),
          col("a.tf").as("tf"), col("b.tf").as("tf_2r"),
          (col("a.tf").cast("double") / col("b.tf").cast("double"))
            .as("decay_ratio"))
        .orderBy("rank")
    },
    Some(
      s"""WITH v AS (
         |  SELECT tok, count(*) AS tf
         |  FROM (SELECT unnest($ddbToks) AS tok FROM documents)
         |  GROUP BY tok ORDER BY tf DESC, tok ASC LIMIT $ZipfTopN),
         |r AS (
         |  SELECT tok, tf, row_number() OVER (ORDER BY tf DESC, tok ASC) AS rank
         |  FROM v),
         |p AS (SELECT * FROM r WHERE (rank & (rank - 1)) = 0)
         |SELECT a.rank AS rank, a.tok AS tok, a.tf AS tf, b.tf AS tf_2r,
         |       CAST(a.tf AS DOUBLE) / CAST(b.tf AS DOUBLE) AS decay_ratio
         |FROM p a JOIN p b ON a.rank * 2 = b.rank
         |ORDER BY rank""".stripMargin))

  def all: Seq[Q] = Seq(
    tokenCount, qualityScore, langIdQ, langMix, langConfusion, fingerprint, redact, repetition,
    qualityBySource, vocab, gopherRules, qualityRank, qualityKeepHist,
    qualityNtile, noveltyNgram, ngramCoverage, zipfCurve)
}

/** Shared DuckDB fragments for the text formulas — the single source of
  * truth for every oracle that embeds them (TextQueries, CurateQueries,
  * MultimodalQueries). Each fragment mirrors the corresponding
  * TextFunctions column builder token-for-token. */
object TextOracleSql {
  import graft.functions.{TextFunctions => T}

  val toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"

  def lexHits(lex: Seq[String]): String = {
    val l = lex.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toks, t -> list_contains($l, t)))"
  }

  val nonSpace = "length(regexp_replace(lower(text), '\\s', '', 'g'))"
  val punct =
    "length(regexp_replace(regexp_replace(lower(text), '\\s', '', 'g'), '[a-z0-9]', '', 'g'))"
  val punctRatio =
    s"CAST($punct AS DOUBLE) / greatest(CAST($nonSpace AS DOUBLE), 1.0)"
  val stopRatio =
    s"CAST(${lexHits(T.Stopwords)} AS DOUBLE) / greatest(CAST(len($toks) AS DOUBLE), 1.0)"
  val avgLen =
    s"CAST(list_sum(list_transform($toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / greatest(CAST(len($toks) AS DOUBLE), 1.0)"
  val quality =
    s"(least(CAST(len($toks) AS DOUBLE), 100.0) / 100.0) * 0.25" +
      s" + (1.0 - least($punctRatio * 4.0, 1.0)) * 0.25" +
      s" + least($stopRatio * 4.0, 1.0) * 0.25" +
      s" + (1.0 - least(abs($avgLen - 5.0) / 5.0, 1.0)) * 0.25"

  val langCase: String = {
    val hits = T.LangLexicons.map { case (lang, lex) => lang -> lexHits(lex) }
    val best = hits.map(_._2).mkString("greatest(", ", ", ")")
    hits.map { case (lang, h) => s"WHEN $h = $best AND $h > 0 THEN '$lang'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
  }

  /** Sum of ascii byte values of an (ASCII) string expression. */
  def byteSum(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> acc + x)"
}
