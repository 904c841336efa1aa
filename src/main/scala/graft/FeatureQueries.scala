package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{HashFunctions => H, TextFunctions => T}

/** ML feature-engineering operators over the warehouse tables — the
  * transformations a training-data pipeline runs between the curated
  * corpus and the trainer: leakage-free target encoding, fixed-width
  * hashed features, and deterministic negative sampling.
  *
  * Same oracle-parity discipline as the rest of the registry: exact
  * integer/DECIMAL accumulation (order-free), ONE double expression at
  * the end with an identical IEEE tree on both engines, engine-neutral
  * hashes ([[graft.functions.HashFunctions]] affine mixes), total ORDER
  * BY.
  */
object FeatureQueries {

  /** Folds for out-of-fold encoding. */
  private val TeFolds = 5

  /** K-fold out-of-fold target encoding (the leakage-free categorical
    * encoder: each fold's rows are encoded with the target mean of the
    * OTHER folds, so a row never sees its own label — the standard
    * guard against target leakage in gradient-boosting / tabular-DL
    * pipelines). Category = customer market segment, target = order
    * price, fold = o_orderkey mod [[TeFolds]] (deterministic, engine-
    * neutral — the same hash-gated assignment the sampling family
    * uses).
    *
    * Shape: fact ⋈ customer shuffles on custkey (customer is NOT
    * broadcast — at warehouse scale the customer dim outgrows the
    * broadcast budget; AQE still promotes it at small SF), then ONE
    * map-side-combining groupBy folds the join to ≤|segments|·K rows;
    * the all-folds totals come from re-aggregating that tiny frame and
    * joining back — never a second fact scan, never a global window.
    * Sums are exact integer cents in DECIMAL(38,0) (scale-0: single
    * correctly-rounded int→double cast on both engines); the encoding
    * is one double division. */
  val targetEncode: Q = Q(
    "feat_target_encode",
    (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_custkey"),
          (col("o_orderkey") % TeFolds).as("fold"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val c = table(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val perFold = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("fold"))
        .agg(count(lit(1)).as("n_fold"),
          sum(col("cents").cast("decimal(38,0)")).as("sum_fold"))
      val totals = perFold.groupBy(col("c_mktsegment"))
        .agg(sum(col("n_fold")).as("n_all"), sum(col("sum_fold")).as("sum_all"))
      perFold.join(broadcast(totals), Seq("c_mktsegment"))
        .select(col("c_mktsegment"), col("fold"), col("n_fold"),
          (col("n_all") - col("n_fold")).as("n_oof"),
          ((col("sum_all") - col("sum_fold")).cast("double") /
            ((col("n_all") - col("n_fold")).cast("double") * 100.0))
            .as("te_price"))
        .orderBy("c_mktsegment", "fold")
    },
    Some(
      s"""WITH j AS (
         |  SELECT c_mktsegment, o_orderkey % $TeFolds AS fold,
         |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |pf AS (
         |  SELECT c_mktsegment, fold, count(*) AS n_fold,
         |         CAST(SUM(cents) AS DECIMAL(38,0)) AS sum_fold
         |  FROM j GROUP BY c_mktsegment, fold),
         |tot AS (
         |  SELECT c_mktsegment, CAST(SUM(n_fold) AS BIGINT) AS n_all,
         |         CAST(SUM(sum_fold) AS DECIMAL(38,0)) AS sum_all
         |  FROM pf GROUP BY c_mktsegment)
         |SELECT pf.c_mktsegment AS c_mktsegment, fold, n_fold,
         |       n_all - n_fold AS n_oof,
         |       CAST(sum_all - sum_fold AS DOUBLE) /
         |         (CAST(n_all - n_fold AS DOUBLE) * 100.0) AS te_price
         |FROM pf JOIN tot ON pf.c_mktsegment = tot.c_mktsegment
         |ORDER BY c_mktsegment, fold""".stripMargin))

  /** Hashed-feature buckets. 256 keeps the output enumerable; real
    * pipelines use 2^18+ — only the literal changes. */
  private val HashBuckets = 256

  /** The hashing trick (Weinberger et al. 2009, feature hashing):
    * token → polyHash mod [[HashBuckets]] — the fixed-width featurizer
    * that needs NO vocabulary pass, the property that makes it the
    * 100 TB featurizer of choice (one scan, no dictionary join, new
    * tokens land deterministically). Reports per-bucket occupancy:
    * total token occurrences, distinct tokens (collision census), and
    * distinct documents touching the bucket. Explode-then-fold: the
    * shuffle carries (bucket, token/doc) pairs, combiners collapse
    * per-partition repeats first. */
  val hashingTrick: Q = Q(
    "feat_hashing_trick",
    (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), (T.polyHash(col("tok")) % HashBuckets).as("bucket"),
        col("tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("tok")).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("bucket"),
    Some(
      s"""WITH e AS (
         |  SELECT doc_id, ${T.polyHashSql("tok")} % $HashBuckets AS bucket, tok
         |  FROM (SELECT doc_id, unnest(${TextOracleSql.toks}) AS tok FROM documents))
         |SELECT bucket, count(*) AS n_occurrences,
         |       count(DISTINCT tok) AS n_tokens,
         |       count(DISTINCT doc_id) AS n_docs
         |FROM e GROUP BY bucket
         |ORDER BY bucket""".stripMargin))

  /** Negatives per anchor and anchor thinning modulus. */
  private val NegK = 4
  private val AnchorMod = 7

  /** Deterministic negative sampling for contrastive training: every
    * [[AnchorMod]]-th document anchors [[NegK]] pseudo-random negatives
    * drawn by the affine hash family h_j(id) = (a_j·id + b_j) mod p mod
    * n — the seeded-RNG pattern made engine-neutral (the oracle replays
    * the exact draw). Self-collisions remap to the next id mod n.
    *
    * Works because doc_ids are DENSE 0..n−1 (asserted by the join
    * producing exactly anchors·K rows); n derives from ONE count (a
    * parquet-footer read under aggregatePushDown). Scale shape: no
    * candidate enumeration, no per-anchor scan — the draw is a column
    * expression and the negative's attributes attach by ONE hash join
    * on neg_id. At 100 TB this is the linear-cost alternative to the
    * quadratic "sample from the other documents" subquery. */
  val negatives: Q = Q(
    "sample_negatives",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val n = docs.count() // footer-read parameter derivation
      // Both multiplicands reduced mod M BEFORE the product: each is
      // < M ≈ 1e9+7, so the product stays < ~1.0e18 < Long.MaxValue for
      // ANY doc_id (an unreduced doc_id beyond ~9.2e9 would wrap Long
      // silently in Spark while DuckDB BIGINT errors — latent 100 TB
      // divergence). Values are unchanged wherever no wrap occurred.
      val raw = ((lit(H.MixMulA) * (lit(2) * col("j") + 1) % T.HashMod *
        (col("doc_id") % T.HashMod)) % T.HashMod +
        lit(H.MixMulB) * (col("j") + 1) % T.HashMod) % T.HashMod % n
      docs.filter(col("doc_id") % AnchorMod === 0)
        .select(col("doc_id"), explode(sequence(lit(1), lit(NegK))).as("j"))
        .withColumn("neg_raw", raw)
        .withColumn("neg_id",
          when(col("neg_raw") === col("doc_id"), (col("neg_raw") + 1) % n)
            .otherwise(col("neg_raw")))
        .join(docs.select(col("doc_id").as("neg_id"), col("source").as("neg_source"),
          col("lang").as("neg_lang")), Seq("neg_id"))
        .select(col("doc_id").as("anchor_id"), col("j"), col("neg_id"),
          col("neg_source"), col("neg_lang"))
        .orderBy("anchor_id", "j")
    },
    Some(
      s"""WITH n AS (SELECT count(*) AS n FROM documents),
         |a AS (
         |  SELECT doc_id, j,
         |         ((${H.MixMulA} * (2 * j + 1) % ${T.HashMod} * (doc_id % ${T.HashMod})) % ${T.HashMod} +
         |          ${H.MixMulB} * (j + 1) % ${T.HashMod}) % ${T.HashMod} % n AS neg_raw,
         |         n
         |  FROM documents, (SELECT unnest(generate_series(1, $NegK)) AS j), n
         |  WHERE doc_id % $AnchorMod = 0)
         |SELECT a.doc_id AS anchor_id, j,
         |       CASE WHEN neg_raw = a.doc_id THEN (neg_raw + 1) % n ELSE neg_raw END AS neg_id,
         |       d.source AS neg_source, d.lang AS neg_lang
         |FROM a JOIN documents d
         |  ON d.doc_id = CASE WHEN neg_raw = a.doc_id THEN (neg_raw + 1) % n ELSE neg_raw END
         |ORDER BY anchor_id, j""".stripMargin))

  /** Per-group z-score standardization (the fit+transform a tabular
    * feature pipeline runs per category): each customer's account
    * balance standardized against its market segment's mean/std.
    * Algebra keeps everything integer until ONE double expression:
    * z = (n·x − Σx) / √(n·Σx² − (Σx)²) — the (x−μ)/σ form cleared of
    * divisions, so the inputs are exact scale-0 sums (the [[Q]]
    * `olap_group_corr` cast discipline; the oracle carries them as
    * HUGEINT — Σx² and (Σx)² outgrow BIGINT at sf0.1) and the
    * division+sqrt are one identically-shaped IEEE tree. Degenerate
    * segments (zero variance) filter on the exact-integer predicate.
    * One scan + one tiny-stats broadcast join back; at 100 TB the fit
    * is the scan and the transform is map-side. */
  val standardize: Q = Q(
    "feat_standardize",
    (s, dir) => {
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("xc"))
      val stats = c.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("xc").cast("decimal(38,0)")).as("sx"),
          sum((col("xc") * col("xc")).cast("decimal(38,0)")).as("sxx"))
        .filter(col("n") >= 2 &&
          col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx") > 0)
      c.join(broadcast(stats), Seq("c_mktsegment"))
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("xc").cast("double") / 100.0).as("c_acctbal"),
          ((col("n").cast("decimal(38,0)") * col("xc") - col("sx")).cast("double") /
            sqrt((col("n").cast("decimal(38,0)") * col("sxx") -
              col("sx") * col("sx")).cast("double"))).as("z"))
        .orderBy("c_custkey")
    },
    Some(
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
        |  FROM customer),
        |stats AS (
        |  SELECT c_mktsegment, count(*) AS n,
        |         CAST(SUM(xc) AS HUGEINT) AS sx,
        |         CAST(SUM(xc * xc) AS HUGEINT) AS sxx
        |  FROM c GROUP BY c_mktsegment
        |  HAVING count(*) >= 2 AND count(*) * CAST(SUM(xc * xc) AS HUGEINT)
        |           - CAST(SUM(xc) AS HUGEINT) * CAST(SUM(xc) AS HUGEINT) > 0)
        |SELECT c_custkey, c.c_mktsegment AS c_mktsegment,
        |       CAST(xc AS DOUBLE) / 100.0 AS c_acctbal,
        |       CAST(n * xc - sx AS DOUBLE) /
        |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) AS z
        |FROM c JOIN stats ON c.c_mktsegment = stats.c_mktsegment
        |ORDER BY c_custkey""".stripMargin))

  /** Bootstrap replicates and the Poisson(1) inverse-CDF thresholds on
    * a 10^6 grid, computed once here and embedded as the SAME integer
    * literals in both engines (the HllEstConst fold-the-constant
    * discipline — no libm exp() in-engine). */
  private val BootReplicates = 3
  private val PoissonThresh: Seq[Long] = {
    val pmf = Iterator.iterate((math.exp(-1.0), 0)) { case (p, k) =>
      (p / (k + 1), k + 1)
    }.map(_._1).take(5).toSeq
    pmf.scanLeft(0.0)(_ + _).tail.map(c => (c * 1000000).toLong)
  }

  /** Distributed bootstrap (the resampling-with-replacement variance
    * estimator at corpus scale): each replicate draws every document
    * Poisson(1) times — the standard Poissonized bootstrap, which
    * needs NO global n and no coordination: the draw count is a pure
    * column expression (hash → uniform grid → inverse-CDF threshold
    * ladder), so 100 TB costs [[BootReplicates]] conditional
    * aggregates of one scan. Reports each replicate's drawn mass and
    * its weighted mean doc length — the spread ACROSS replicates is
    * the bootstrap standard error a curation dashboard quotes. Draws
    * replay exactly in the oracle (affine hash + integer thresholds);
    * the mean is exact integer sums + one double division.
    *
    * The grid value is the per-replicate affine mix of the CONTENT
    * hash ([[T.fingerprintRolling]] — the sample_mix gate's source of
    * randomness), not of doc_id: an affine map of a small dense id
    * range folds to a tiny arithmetic progression under the final
    * mod-10⁶ (measured: all 500 docs of a replicate landed in ONE
    * CDF bucket — replicate draws of 3n, 0, n), while the polyHash
    * value already occupies the full modulus. */
  val bootstrap: Q = Q(
    "sample_bootstrap",
    (s, dir) => {
      val u = (lit(H.MixMulA) * (lit(2) * (col("b") + 10) + 1) % T.HashMod *
        col("h") +
        lit(H.MixMulB) * (col("b") + 11) % T.HashMod) % T.HashMod % 1000000L
      val cnt = PoissonThresh.zipWithIndex.foldRight(lit(5L): org.apache.spark.sql.Column) {
        case ((t, k), e) => when(col("u") < t, k.toLong).otherwise(e)
      }
      table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          T.fingerprintRolling(col("text")).as("h"),
          explode(sequence(lit(1), lit(BootReplicates))).as("b"))
        .withColumn("u", u)
        .withColumn("cnt", cnt)
        .groupBy(col("b"))
        .agg(sum(col("cnt")).as("n_drawn"),
          sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("n_unique"),
          sum(col("cnt") * col("n_chars")).as("mass"))
        // an all-zero replicate is a ~0.37^n event, but ANSI mode turns
        // its 0/0 into a hard error (measured, not hypothetical: the
        // pre-fix degenerate draw produced one) — filter on the exact
        // integer in BOTH engines rather than try_divide-NULLing
        .filter(col("n_drawn") > 0)
        .select(col("b").as("replicate"), col("n_drawn"), col("n_unique"),
          (col("mass").cast("double") / col("n_drawn").cast("double"))
            .as("mean_chars"))
        .orderBy("replicate")
    },
    Some {
      val ladder = PoissonThresh.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString(" ")
      val fp = T.polyHashSql("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
      s"""WITH d AS (
         |  SELECT doc_id, n_chars, b,
         |         (${H.MixMulA} * (2 * (b + 10) + 1) % ${T.HashMod} * ($fp) +
         |          ${H.MixMulB} * (b + 11) % ${T.HashMod}) % ${T.HashMod} % 1000000 AS u
         |  FROM documents, (SELECT unnest(generate_series(1, $BootReplicates)) AS b)),
         |c AS (SELECT b, CASE $ladder ELSE 5 END AS cnt, n_chars FROM d)
         |SELECT b AS replicate,
         |       CAST(SUM(cnt) AS BIGINT) AS n_drawn,
         |       CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |       CAST(CAST(SUM(cnt * n_chars) AS BIGINT) AS DOUBLE) /
         |         CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) AS mean_chars
         |FROM c GROUP BY b
         |HAVING SUM(cnt) > 0
         |ORDER BY replicate""".stripMargin
    })

  def all: Seq[Q] = Seq(targetEncode, hashingTrick, negatives, standardize,
    bootstrap)
}
