package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.pipelines.Wor

/** WOR multi-table workbook queries (wor2.py parity — SURVEY.md §3 entry
  * point 3), oracle-checked vs DuckDB.
  *
  * The oracles reproduce the synthesized named-table family and the
  * bucket cleans arithmetically; the Spark side genuinely parses the
  * table names (F10/D9) — both converge on the same rows.
  */
object WorQueries {

  /** The 13 category product names in fixture index order (Wor.ProductNames)
    * as a DuckDB list literal. */
  private val ddbProducts = Wor.ProductNames
    .map(p => s"'${p.replace("'", "''")}'").mkString("[", ", ", "]")

  /** ZONE_MAPPING over the zone_idx domain: Zone1-6 → 1-6, KamEast → 9,
    * KamCentral → 8 (wor2.py:50-62). */
  private val ddbZoneId =
    "CASE WHEN zone_idx = 6 THEN 9 WHEN zone_idx = 7 THEN 8 ELSE zone_idx + 1 END"

  private val ddbForecastPrep =
    s"""WITH m AS (SELECT unnest(generate_series(1, 12)) AS mes_num),
       |rows_ AS (
       |  SELECT
       |    CASE WHEN c_custkey % 97 = 0 THEN 'ghost forecast ' || CAST(c_custkey AS VARCHAR)
       |         WHEN c_custkey % 89 = 0 THEN '0'
       |         ELSE '  ' || c_name || '  ' END AS nombre_cliente,
       |    CASE WHEN (c_custkey + 1) % 37 = 0 THEN 0.0 ELSE c_acctbal + 100.0 + mes_num END AS semana_1,
       |    CASE WHEN (c_custkey + 2) % 37 = 0 THEN 0.0 ELSE c_acctbal + 200.0 + mes_num END AS semana_2,
       |    CASE WHEN (c_custkey + 3) % 37 = 0 THEN 0.0 ELSE c_acctbal + 300.0 + mes_num END AS semana_3,
       |    CASE WHEN (c_custkey + 4) % 37 = 0 THEN 0.0 ELSE c_acctbal + 400.0 + mes_num END AS semana_4,
       |    CASE WHEN (c_custkey + 5) % 37 = 0 THEN 0.0 ELSE c_acctbal + 500.0 + mes_num END AS semana_5,
       |    CAST(c_custkey % 8 AS INT) AS zone_idx,
       |    mes_num, c_custkey
       |  FROM customer CROSS JOIN m),
       |dim AS (SELECT c_custkey AS id_cliente, upper(trim(c_name)) AS k FROM customer),
       |prep AS (
       |  SELECT r.semana_1, r.semana_2, r.semana_3, r.semana_4, r.semana_5,
       |         CAST(r.mes_num AS INT) AS mes, ${Wor.WorYear} AS anio,
       |         CAST(d.id_cliente AS BIGINT) AS id_cliente,
       |         $ddbZoneId AS id_zone,
       |         monthname(make_date(${Wor.WorYear}, r.mes_num, 1)) AS nombre_mes
       |  FROM rows_ r JOIN dim d ON upper(trim(r.nombre_cliente)) = d.k
       |  WHERE r.nombre_cliente <> '0')""".stripMargin

  val forecastLoad: Q = Q(
    "wor_forecast_load",
    (s, dir) => Wor.forecastLoad(s, dir).orderBy("id_cliente", "mes"),
    Some(
      s"""$ddbForecastPrep
         |SELECT * FROM prep
         |WHERE mes > ${Wor.LoadedThroughMonth}
         |ORDER BY id_cliente, mes""".stripMargin))

  val forecastRerunZero: Q = Q(
    "wor_forecast_rerun_zero",
    (s, dir) => Wor.forecastRerun(s, dir).orderBy("id_cliente", "mes"),
    Some(
      s"""$ddbForecastPrep
         |SELECT * FROM prep WHERE FALSE
         |ORDER BY id_cliente, mes""".stripMargin))

  val cuotasCategoriaLoad: Q = Q(
    "wor_cuotas_categoria_load",
    (s, dir) => Wor.cuotasCategoriaLoad(s, dir)
      .orderBy("id_producto", "id_zone", "mes"),
    Some(
      s"""WITH cat_base AS (
         |  SELECT CAST(o_custkey % 8 AS INT) AS zone_idx,
         |         month(o_orderdate) AS mes_num,
         |         CAST(o_orderkey % 13 AS INT) AS prod_idx,
         |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS vta_d,
         |         COUNT(*) AS vta_v
         |  FROM orders GROUP BY 1, 2, 3),
         |cat AS (
         |  SELECT list_extract($ddbProducts, prod_idx + 1) AS nombre_producto,
         |         CASE WHEN prod_idx % 5 = 0 THEN 0.0 ELSE vta_d END AS cuota_dinero,
         |         CAST(vta_v AS BIGINT) AS cuota_volumen,
         |         prod_idx, zone_idx, mes_num
         |  FROM cat_base)
         |SELECT cuota_dinero, cuota_volumen,
         |       CAST(prod_idx AS INT) AS id_producto,
         |       $ddbZoneId AS id_zone,
         |       monthname(make_date(${Wor.WorYear}, mes_num, 1)) AS nombre_mes,
         |       CAST(mes_num AS INT) AS mes, ${Wor.WorYear} AS anio
         |FROM cat
         |WHERE prod_idx BETWEEN 1 AND 11 AND mes_num > ${Wor.LoadedThroughMonth}
         |ORDER BY id_producto, id_zone, mes""".stripMargin))

  /** SURVEY §3 quirk 1 — the Cuota_forecast path is dead: always empty. */
  val zoneQuotasDead: Q = Q(
    "wor_zone_quotas_dead",
    (s, dir) => Wor.zoneQuotasLoad(s, dir),
    Some(
      """SELECT CAST(NULL AS INT) AS id_zone, CAST(NULL AS BIGINT) AS id_cliente,
        |       CAST(NULL AS DOUBLE) AS cuota, CAST(NULL AS VARCHAR) AS nombre_mes,
        |       CAST(NULL AS INT) AS mes, CAST(NULL AS INT) AS anio
        |WHERE FALSE""".stripMargin))

  def all: Seq[Q] = Seq(
    forecastLoad, forecastRerunZero, cuotasCategoriaLoad, zoneQuotasDead)
}
