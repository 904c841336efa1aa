package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{TextFunctions => T}

/** Capstone: the operators composed into an end-to-end training-corpus
  * curation pass — what this engine exists to run at 100 TB. One
  * pipeline over `documents`:
  *
  *   1. profile every doc (tokens, quality, language);
  *   2. exact-dedup on the content fingerprint (keep smallest doc_id);
  *   3. gate on quality ≥ 0.5, predicted language 'en', ≥ 20 tokens;
  *   4. emit keep/drop with the FIRST failing reason per doc.
  *
  * Plan shape: one scan, one shuffle (hash by fingerprint into the
  * keeper-id window) — gates are pure column predicates evaluated in
  * the same stage as the profile, and the profile scalars run exactly
  * once. At 100 TB nothing changes structurally: the fingerprint
  * shuffle is the only data movement.
  */
object CurateQueries {

  private val MinTokens = 20
  private val MinQuality = 0.5

  val curate: Q = Q(
    "curate_corpus",
    (s, dir) => {
      val d = table(s, dir, "documents")
      val profiled = d.select(
        col("doc_id"),
        T.fingerprintMd5(col("text")).as("fp"),
        T.tokenCount(col("text")).as("n_tokens"),
        T.qualityScore(col("text")).as("quality"),
        T.langId(col("text")).as("lang_pred"))
      // keeper via an unbounded-frame window, NOT groupBy(fp)+join-back:
      // the join formulation derives BOTH sides from `profiled`, so the
      // expensive profile scalars (quality/lang over every doc) execute
      // twice and the data shuffles twice (agg + SMJ); the window is one
      // profile pass and one shuffle (hash by fp), identical output.
      val keeperW = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      profiled
        .withColumn("keeper_id", min(col("doc_id")).over(keeperW))
        .select(
          col("doc_id"), col("n_tokens"), col("quality"), col("lang_pred"),
          when(col("doc_id") =!= col("keeper_id"), lit("duplicate"))
            .when(col("quality") < MinQuality, lit("low_quality"))
            .when(col("lang_pred") =!= "en", lit("wrong_lang"))
            .when(col("n_tokens") < MinTokens, lit("too_short"))
            .otherwise(lit("keep")).as("verdict"))
        // no output sort (r14): the sampling pass re-ran the whole
        // per-doc profile (quality + langId); gate is order-insensitive
    },
    Some {
      // DuckDB mirror of the same profile + gates — fragments shared
      // with TextQueries' oracles via TextOracleSql (single source).
      val toks = TextOracleSql.toks
      val quality = TextOracleSql.quality
      val langCase = TextOracleSql.langCase

      s"""WITH profiled AS (
         |  SELECT doc_id,
         |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |         len($toks) AS n_tokens,
         |         $quality AS quality,
         |         $langCase AS lang_pred
         |  FROM documents),
         |keepers AS (SELECT fp, min(doc_id) AS keeper_id FROM profiled GROUP BY fp)
         |SELECT p.doc_id, p.n_tokens, p.quality, p.lang_pred,
         |       CASE WHEN p.doc_id <> k.keeper_id THEN 'duplicate'
         |            WHEN p.quality < $MinQuality THEN 'low_quality'
         |            WHEN p.lang_pred <> 'en' THEN 'wrong_lang'
         |            WHEN p.n_tokens < $MinTokens THEN 'too_short'
         |            ELSE 'keep' END AS verdict
         |FROM profiled p JOIN keepers k USING (fp)
         |ORDER BY doc_id""".stripMargin
    })

  /** Per-source document cap — the domain-balancing step of corpus
    * curation (web pipelines cap documents per registered domain so one
    * hot site cannot dominate the training mix; `source` plays the
    * domain here): keep at most [[CapPerSource]] best docs per source by
    * quality score, ties toward the lower doc_id.
    *
    * Shape: the k-bounded `graft_topk` aggregate (plans/TopKByScore), so
    * the map-side partial pass reduces every partition to ≤ k pairs per
    * source and the shuffle carries k-element buffers — the rank-window
    * formulation would shuffle EVERY scored document to discard all but
    * k per group, which at 100 TB is a full-corpus shuffle for a
    * fixed-size answer. The oracle IS the rank window (crossing
    * formulations, not just engines — same rule as sim_knn_topk). */
  // NB: declared BEFORE sourceCap — the oracle string interpolates it at
  // object init, so a later declaration would bake in 0 (and only the
  // lazily-run Spark side would see 15).
  private val CapPerSource = 15

  val sourceCap: Q = Q(
    "curate_source_cap",
    (s, dir) => {
      import graft.functions.{HashFunctions => H}
      val scored = table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          T.qualityScore(col("text")).as("q"))
      scored.groupBy(col("source"))
        .agg(H.topKByScore(col("q"), col("doc_id"), CapPerSource).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("source"), col("p.id").as("doc_id"),
          col("p.score").as("quality"),
          (col("pos") + 1).cast("long").as("rank"))
        .orderBy("source", "rank")
    },
    Some(
      s"""WITH s AS (
         |  SELECT source, doc_id, ${TextOracleSql.quality} AS q FROM documents),
         |r AS (SELECT source, doc_id, q,
         |        row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rank
         |      FROM s)
         |SELECT source, doc_id, q AS quality, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= $CapPerSource
         |ORDER BY source, rank""".stripMargin))

  /** k-anonymity audit threshold: a quasi-identifier group with fewer
    * than this many members is re-identification-risky. */
  private val AnonK = 5

  /** k-anonymity audit — the privacy screen a training-data release
    * runs before shipping: group records by their quasi-identifier tuple
    * (here nation × market segment × account-balance band, the classic
    * "not identifying alone, identifying together" columns) and report,
    * per nation, how many records sit in groups smaller than k — each
    * such record is re-identifiable by its QI tuple alone.
    *
    * Float discipline: the balance band is floor(acctbal / 1000) — one
    * correctly-rounded IEEE division + floor, bit-identical across
    * engines (no accumulation); the risky fraction crosses engines as
    * integer parts-per-million (BIGINT multiply + integer divide), never
    * a double ratio.
    *
    * Scale shape: two map-side-combining aggregations (QI groups, then
    * nation rollup) — the first shuffle carries one row per DISTINCT QI
    * tuple, the second one row per group; nothing row-level ever
    * shuffles. At 100 TB this is the cheapest possible shape for an
    * exact audit. */
  val kAnonymity: Q = Q(
    "curate_k_anonymity",
    (s, dir) => {
      val groups = table(s, dir, "customer")
        .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
          floor(col("c_acctbal").cast("double") / 1000.0).cast("long").as("bal_band"))
        .groupBy(col("nation"), col("segment"), col("bal_band"))
        .agg(count(lit(1)).as("cnt"))
      groups.groupBy(col("nation"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("cnt") < AnonK, lit(1L)).otherwise(lit(0L))).as("n_risky_groups"),
          sum(when(col("cnt") < AnonK, col("cnt")).otherwise(lit(0L))).as("n_risky_rows"))
        .select(col("nation"), col("n_rows"), col("n_groups"),
          col("n_risky_groups"), col("n_risky_rows"),
          expr("(n_risky_rows * 1000000L) div n_rows").as("risky_ppm"))
        .orderBy("nation")
    },
    Some(
      s"""WITH g AS (
         |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         |         CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bal_band,
         |         count(*) AS cnt
         |  FROM customer GROUP BY 1, 2, 3)
         |SELECT nation,
         |       CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |       count(*) AS n_groups,
         |       CAST(SUM(CASE WHEN cnt < $AnonK THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
         |       CAST(SUM(CASE WHEN cnt < $AnonK THEN cnt ELSE 0 END) AS BIGINT) AS n_risky_rows,
         |       (CAST(SUM(CASE WHEN cnt < $AnonK THEN cnt ELSE 0 END) AS BIGINT) * 1000000)
         |         // CAST(SUM(cnt) AS BIGINT) AS risky_ppm
         |FROM g GROUP BY nation
         |ORDER BY nation""".stripMargin))

  /** Noise half-width for the private release: uniform on [-3, 3]. */
  private val NoiseHalfWidth = 3

  /** Noisy-histogram release — the differential-privacy release
    * PATTERN for publishing corpus composition stats (per lang ×
    * source document counts) without exposing exact cell values:
    * pre-aggregate, perturb each cell with noise drawn from the cell
    * key, clamp at zero, publish alongside nothing row-level. The
    * draw here is uniform-integer from the engine-neutral polyHash of
    * the cell key — a DETERMINISTIC stand-in so the oracle replays the
    * release bit-for-bit; a production ε-DP release swaps in a
    * calibrated two-sided geometric draw at the same single site (the
    * mechanism shape — integer noise on integer counts — is exactly
    * the discrete mechanism's). ln()-based Laplace is deliberately
    * avoided in-engine: libm last-ulp behavior is engine-specific
    * (same reasoning as the HLL linear-counting branch).
    *
    * Scale: one map-side-combining groupBy to |langs|·|sources| rows;
    * the perturbation is a per-row column expression on the tiny
    * aggregate. */
  val noisyCounts: Q = Q(
    "curate_noisy_counts",
    (s, dir) => table(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise",
        T.polyHash(concat_ws("|", col("lang"), col("source"))) %
          (2 * NoiseHalfWidth + 1) - NoiseHalfWidth)
      .select(col("lang"), col("source"),
        greatest(col("n_true") + col("noise"), lit(0L)).as("n_released"))
      .orderBy("lang", "source"),
    Some(
      s"""WITH agg AS (
         |  SELECT lang, source, count(*) AS n_true FROM documents
         |  GROUP BY lang, source),
         |p AS (
         |  SELECT lang, source, n_true,
         |         ${T.polyHashSql("lang || '|' || source")} %
         |           ${2 * NoiseHalfWidth + 1} - $NoiseHalfWidth AS noise
         |  FROM agg)
         |SELECT lang, source, GREATEST(n_true + noise, 0) AS n_released
         |FROM p
         |ORDER BY lang, source""".stripMargin))

  def all: Seq[Q] = Seq(curate, sourceCap, kAnonymity, noisyCounts)
}
