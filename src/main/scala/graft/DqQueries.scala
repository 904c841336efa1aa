package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table

/** Data-quality profiling (SURVEY.md §7.2 step 7): per-column profile —
  * row count, null count, distinct count, numeric/string min-max — the
  * DQ surface a load job reports before committing a batch.
  *
  * Shape (rewritten round 3): one branch per column, each a two-level
  * aggregation — `groupBy(value).count` (partial map-side combine, then
  * a shuffle carrying only the DISTINCT values) folded into the profile
  * row. The previous single-agg formulation planned the 4-column
  * multi-distinct as an Expand ×5 over the full scan — a 5× row
  * explosion shuffled on every profiled column at once, the exact shape
  * that dies at 100 TB (measured 7 s median at sf0.1, ~3× this form).
  * Per-branch scans are columnar: each reads exactly one parquet column
  * (`ReadSchema` one field), so 4 narrow scans beat 1 wide expand.
  *
  * Distinct counts here are exact so the DuckDB oracle can hash-match;
  * at 100 TB swap the groupBy level for `approx_count_distinct` (HLL,
  * mergeable) and drop the oracle to a rows-only check — the HLL
  * sketches of the two engines are not bit-compatible.
  */
object DqQueries {

  private case class Col(name: String, numeric: Boolean)

  private val Profiled = Seq(
    Col("l_quantity", numeric = true),
    Col("l_extendedprice", numeric = true),
    Col("l_returnflag", numeric = false),
    Col("l_linestatus", numeric = false))

  val profile: Q = Q(
    "dq_profile",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      val branches = Profiled.map { c =>
        li.select(col(c.name).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
          .agg(
            // coalesce: sum over zero groups is NULL, count(*) was 0 —
            // keep the empty-input semantics the oracle's count(*) has
            coalesce(sum(col("cnt")), lit(0L)).as("n"),
            coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
              .as("n_null"),
            // count(DISTINCT c) semantics: nulls excluded
            count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
            (if (c.numeric) min(col("v")).cast("double")
             else lit(null).cast("double")).as("min_num"),
            (if (c.numeric) max(col("v")).cast("double")
             else lit(null).cast("double")).as("max_num"),
            (if (c.numeric) lit(null).cast("string")
             else min(col("v")).cast("string")).as("min_str"),
            (if (c.numeric) lit(null).cast("string")
             else max(col("v")).cast("string")).as("max_str"))
          .select(lit(c.name).as("col_name"), col("n"), col("n_null"),
            col("n_distinct"), col("min_num"), col("max_num"),
            col("min_str"), col("max_str"))
      }
      branches.reduce(_ unionAll _).orderBy("col_name")
    },
    Some {
      val selects = Profiled.map { c =>
        val (minNum, maxNum, minStr, maxStr) =
          if (c.numeric)
            (s"CAST(min(${c.name}) AS DOUBLE)", s"CAST(max(${c.name}) AS DOUBLE)",
              "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
          else
            ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
              s"CAST(min(${c.name}) AS VARCHAR)", s"CAST(max(${c.name}) AS VARCHAR)")
        s"""SELECT '${c.name}' AS col_name, count(*) AS n,
           |  CAST(SUM(CASE WHEN ${c.name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  count(DISTINCT ${c.name}) AS n_distinct,
           |  $minNum AS min_num, $maxNum AS max_num,
           |  $minStr AS min_str, $maxStr AS max_str
           |FROM lineitem""".stripMargin
      }
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })

  def all: Seq[Q] = Seq(profile)
}
