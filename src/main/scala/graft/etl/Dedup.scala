package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-load dedup — SURVEY.md §2.5 J4/J5.
  *
  * Reference semantics (ventas_totales.py:169-209; wor2.py:231-239 etc.):
  * normalize the key columns on BOTH sides, then keep only incoming rows
  * whose key tuple is absent from the target. Within-batch duplicates are
  * NOT removed (SURVEY §3 quirk 4): anti-join alone reproduces that — do
  * not add dropDuplicates on the input.
  */
object Dedup {

  /** J4/J5 — left anti-join against the target's key set.
    *
    * Scale: the target side can be huge (every previously loaded row), so
    * we project it to the key columns FIRST (key-only scan, parity with
    * `SELECT keys FROM target` — ventas_totales.py:176-180), distinct it
    * (map-side partial agg shrinks the shuffle), and let AQE pick
    * broadcast vs shuffled-hash vs SMJ from the runtime size. Runtime
    * bloom filters (spark.sql.optimizer.runtime.bloomFilter.enabled)
    * prune the incoming side before the shuffle when the key set is big.
    */
  def antiJoinNew(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val keySet = existing.select(keys.map(col): _*).distinct()
    incoming.join(keySet, keys, "left_anti")
  }

  /** J4 with per-side key normalization (ventas_totales.py:186-203): the
    * normalization is applied below the join so column pruning and
    * runtime filters stay effective. `normalized` maps key name →
    * normalization expression over that column.
    */
  def antiJoinNewNormalized(
      incoming: DataFrame, existing: DataFrame,
      normalized: Seq[(String, Column => Column)]): DataFrame = {
    val keys = normalized.map(_._1)
    def norm(df: DataFrame): DataFrame =
      normalized.foldLeft(df) { case (d, (k, f)) =>
        d.withColumn(s"__k_$k", f(col(k)))
      }
    val normKeys = keys.map(k => s"__k_$k")
    val keySet = norm(existing).select(normKeys.map(col): _*).distinct()
    norm(incoming)
      .join(keySet, normKeys, "left_anti")
      .drop(normKeys: _*)
  }

  /** J4 for the SELF-DERIVED-target case: the existing side is, by
    * construction, `incoming.filter(existingPred)` projected to keys —
    * the harness shape, where "already loaded" rows are a predicate
    * over the same derived file. [[antiJoinNewNormalized]] would
    * execute the incoming subtree TWICE (once per join side; the
    * round-8/9 materialization A/Bs showed recompute beats caching the
    * wide frame, but both passes remain). This form computes the same
    * multiset in ONE pass: a per-key window flags whether ANY row of
    * the key's group satisfies the predicate, and flagged groups drop.
    * Same shuffle key as the anti-join, one derivation instead of two,
    * no runtime-bloom machinery.
    *
    * Null caveat (why this is not the general operator): an equi
    * anti-join treats a NULL key as matching nothing (the row always
    * survives), while a window partition groups NULL keys together.
    * Callers must guarantee non-null normalized keys — true for the
    * ventas keys by construction (id_cliente inner-joined, strict date
    * on a generated format, keys from non-null TPC-H columns). When the
    * target is a genuinely separate table (the production S6 scan),
    * use [[antiJoinNewNormalized]] — there is no single-pass form. */
  def antiJoinSelfNormalized(
      incoming: DataFrame, existingPred: Column,
      normalized: Seq[(String, Column => Column)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(
      normalized.map { case (k, f) => f(col(k)) }: _*)
    incoming
      .withColumn("__in_existing",
        max(when(existingPred, 1).otherwise(0)).over(w))
      .filter(col("__in_existing") === 0)
      .drop("__in_existing")
  }

  /** Exact duplicate removal within a dataset (training-data pipeline
    * operator): hash-groupBy on the content columns, keep the row with
    * the smallest id. Distributed: one shuffle on the content hash. */
  def exactDedup(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(contentCols.map(col): _*)
      .orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
