package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table

/** Documented downstream analysis queries (SURVEY.md §2.6-§2.7) plus the
  * core relational surface, each oracle-checked vs DuckDB.
  *
  * Double aggregation goes through exact DECIMAL sums (order-independent)
  * and back to DOUBLE — see Registry's parity rules.
  */
object AnalysisQueries {

  /** A4 — grouped trend aggregation (Pending Orders PDF §7). */
  val trendByMonth: Q = Q(
    "trend_by_month",
    (s, dir) => table(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("anio"), month(col("o_orderdate")).as("mes"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("anio", "mes"),
    Some(
      """SELECT year(o_orderdate) AS anio, month(o_orderdate) AS mes,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY anio, mes""".stripMargin))

  /** Q1-style wide aggregation (A4): grouped sums/avg/count on lineitem. */
  val q1Agg: Q = Q(
    "q1_agg",
    (s, dir) => table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  def all: Seq[Q] = Seq(trendByMonth, q1Agg)
}
