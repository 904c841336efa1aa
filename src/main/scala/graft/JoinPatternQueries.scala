package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table

/** Join-shape operators that exist purely for how they behave at scale:
  * explicit skew salting, blocked fuzzy (edit-distance) matching, and
  * per-group top-k selection. Each has a plain declarative oracle — the
  * POINT is that the scale-safe plan provably returns the identical
  * rows.
  */
object JoinPatternQueries {

  /** Salt fan-out for the skew join. 8 is illustrative; production sizes
    * it to ceil(hot-key rows / target partition rows). */
  private val Salts = 8

  /** Explicit skew-salted equi-join: lineitem ⋈ orders on orderkey,
    * revenue by order priority — [[graft.etl.Skew.saltedJoin]] under the
    * full oracle gate (previously evidenced only by its spec).
    *
    * The skew problem: a hash join on a power-law key sends every row of
    * the hottest key to ONE reducer — the stage runs at the speed of
    * that single task. AQE's skew-join split handles moderate skew, but
    * a catastrophic single-key hot spot (one key > executor memory)
    * needs pre-salting: the FACT side salts each row by a deterministic
    * full-row hash into [[Salts]] sub-keys, the other side replicates to
    * ALL salts, and the join key becomes (orderkey, salt) — the hot
    * key's rows spread over [[Salts]] reducers. Replication cost is
    * Salts× the SMALL side only. The salt never reaches the output and
    * the aggregate is partition-invariant, so the result is provably
    * identical to the unsalted join — exactly what the plain-SQL oracle
    * checks.
    *
    * Money math is end-to-end DECIMAL (price × (1 − discount) with both
    * operands cast first) so the sum is accumulation-order independent
    * — see Registry's oracle-parity rules. */
  val saltedSkewJoin: Q = Q(
    "join_salted_skew",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.etl.Skew.saltedJoin(li, ord, Seq("o_orderkey"), Salts)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some(
      """SELECT o_orderpriority,
        |       count(*) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin))

  /** Blocked fuzzy self-join: pairs of DISTINCT part names within edit
    * distance 2, blocked on the name's second token.
    *
    * The scale discipline, in order: (1) collapse to distinct names
    * FIRST — edit distance is a property of the name, not the row, so
    * the 100 TB row count drops to the name-vocabulary count before any
    * pairing; (2) block on a cheap key (here the noun token; in
    * production a length band + first-char or a q-gram signature) so
    * candidate generation is an EQUI-join — shuffle-partitionable,
    * never a cross product; (3) run the O(len²) levenshtein verifier
    * only on bucket-local candidates; (4) emit each unordered pair once
    * (name_a < name_b). A naive `JOIN ON levenshtein(a,b)<=2` is a
    * BroadcastNestedLoopJoin — O(V²) verifier calls — and is exactly
    * what the oracle runs, on the deduped vocabulary, to prove the
    * blocked plan loses nothing (token-equal blocking is lossless here:
    * distance-≤2 names share the second token because adjectives
    * already differ by ≥3 edits; the general recall-tradeoff caveat is
    * documented, not hidden). */
  val fuzzyNamePairs: Q = Q(
    "join_fuzzy_names",
    (s, dir) => {
      val names = table(s, dir, "part").select(col("p_name")).distinct()
        .withColumn("noun", split(col("p_name"), " ").getItem(1))
      val a = names.select(col("p_name").as("name_a"), col("noun"))
      val b = names.select(col("p_name").as("name_b"), col("noun"))
      a.join(b, Seq("noun"))
        .filter(col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).as("dist"))
        .orderBy("name_a", "name_b")
    },
    Some(
      """WITH d AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       levenshtein(a.p_name, b.p_name) AS dist
        |FROM d a JOIN d b
        |  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin))

  /** Per-group top-k selection: the 3 priciest parts per brand,
    * fully tie-broken (retailprice DESC, partkey ASC) so the selected
    * set is deterministic on both engines. row_number-over-partition is
    * the scale shape: one shuffle on the group key, per-group heap-free
    * streaming rank, early-out at k — versus a global sort (full-data
    * exchange) or a per-group collect (unbounded memory on a hot
    * brand). */
  val topkPartsPerBrand: Q = Q(
    "topk_parts_per_brand",
    (s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(desc("p_retailprice"), col("p_partkey"))
      table(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_name"),
          col("p_retailprice"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy("p_brand", "rk")
    },
    Some(
      """WITH r AS (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |         ROW_NUMBER() OVER (
        |           PARTITION BY p_brand
        |           ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part)
        |SELECT p_brand, p_partkey, p_name, p_retailprice, rk
        |FROM r WHERE rk <= 3
        |ORDER BY p_brand, rk""".stripMargin))

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the SQL
    * equality that matches NULL to NULL — the semantics a plain `=`
    * join silently drops rows under. Fixture: a nullable segment key
    * (every 10th user's segment is unknown → NULL), joined null-safely
    * to the distinct segment table built from the same rows, so the
    * NULL segment becomes a first-class group instead of vanishing.
    * Spark plans `<=>` as a hash join on a null-wrapped key (EqualNullSafe
    * is still an equi-key — no nested loop); counts per segment prove
    * the NULL row survived. */
  val nullSafeJoin: Q = Q(
    "join_null_safe",
    (s, dir) => {
      val e = graft.etl.Sources.events(s, dir)
        .select(col("event_id"), col("user_id"),
          when(col("user_id") % 10 === 0, lit(null).cast("long"))
            .otherwise(col("user_id") % 10).as("segment"))
      val dim = e.select(col("segment")).distinct()
        .select(col("segment").as("d_segment"),
          coalesce(concat(lit("seg_"), col("segment").cast("string")),
            lit("seg_unknown")).as("segment_label"))
      e.join(dim, col("segment") <=> col("d_segment"))
        .groupBy(col("segment_label"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("segment_label")
    },
    Some(
      """WITH e AS (
        |  SELECT event_id, user_id,
        |         CASE WHEN user_id % 10 = 0 THEN NULL
        |              ELSE user_id % 10 END AS segment
        |  FROM events),
        |dim AS (
        |  SELECT DISTINCT segment AS d_segment,
        |         COALESCE('seg_' || CAST(segment AS VARCHAR), 'seg_unknown')
        |           AS segment_label
        |  FROM e)
        |SELECT segment_label, count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users
        |FROM e JOIN dim ON e.segment IS NOT DISTINCT FROM dim.d_segment
        |GROUP BY segment_label
        |ORDER BY segment_label""".stripMargin))

  def all: Seq[Q] = Seq(saltedSkewJoin, fuzzyNamePairs, topkPartsPerBrand,
    nullSafeJoin)
}
