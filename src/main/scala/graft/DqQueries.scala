package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table

/** Data-quality profiling (SURVEY.md §7.2 step 7): one-pass per-column
  * profile — row count, null count, distinct count, numeric/string
  * min-max — the DQ surface a load job reports before committing a
  * batch.
  *
  * Distinct counts here are exact so the DuckDB oracle can hash-match
  * (count_distinct is one shuffle per column at these scales); at 100 TB
  * swap `countDistinct` for `approx_count_distinct` (HLL, mergeable,
  * no extra shuffle) and drop the oracle to a rows-only check — the
  * HLL sketches of the two engines are not bit-compatible.
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
      val perCol = Profiled.map { c =>
        li.agg(
          lit(c.name).as("col_name"),
          count(lit(1)).as("n"),
          sum(when(col(c.name).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c.name)).as("n_distinct"),
          (if (c.numeric) min(col(c.name)).cast("double")
           else lit(null).cast("double")).as("min_num"),
          (if (c.numeric) max(col(c.name)).cast("double")
           else lit(null).cast("double")).as("max_num"),
          (if (c.numeric) lit(null).cast("string")
           else min(col(c.name)).cast("string")).as("min_str"),
          (if (c.numeric) lit(null).cast("string")
           else max(col(c.name)).cast("string")).as("max_str"))
      }
      perCol.reduce(_ unionAll _).orderBy("col_name")
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
