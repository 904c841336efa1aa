package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table

/** Data-quality profiling (SURVEY.md §7.2 step 7): one-pass per-column
  * profile — row count, null count, distinct count, numeric/string
  * min-max — the DQ surface a load job reports before committing a
  * batch. One scan: all 28 aggregates run in a single agg (the multi-
  * distinct is planned as one Expand over the same scan), then `stack`
  * pivots the single row into one row per column.
  *
  * Distinct counts here are exact so the DuckDB oracle can hash-match;
  * at 100 TB swap `countDistinct` for `approx_count_distinct` (HLL,
  * mergeable, no Expand) and drop the oracle to a rows-only check — the
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
      val aggExprs = Profiled.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          count(lit(1)).as(s"n_$i"),
          sum(when(col(c.name).isNull, 1L).otherwise(0L)).as(s"null_$i"),
          countDistinct(col(c.name)).as(s"dist_$i"),
          (if (c.numeric) min(col(c.name)).cast("double")
           else lit(null).cast("double")).as(s"minn_$i"),
          (if (c.numeric) max(col(c.name)).cast("double")
           else lit(null).cast("double")).as(s"maxn_$i"),
          (if (c.numeric) lit(null).cast("string")
           else min(col(c.name)).cast("string")).as(s"mins_$i"),
          (if (c.numeric) lit(null).cast("string")
           else max(col(c.name)).cast("string")).as(s"maxs_$i"))
      }
      val one = li.agg(aggExprs.head, aggExprs.tail: _*)
      val stackArgs = Profiled.zipWithIndex.map { case (c, i) =>
        s"'${c.name}', n_$i, null_$i, dist_$i, minn_$i, maxn_$i, mins_$i, maxs_$i"
      }.mkString(", ")
      one.selectExpr(
        s"stack(${Profiled.size}, $stackArgs) AS " +
          "(col_name, n, n_null, n_distinct, min_num, max_num, min_str, max_str)")
        .orderBy("col_name")
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
