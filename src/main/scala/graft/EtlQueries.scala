package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q

/** ETL parity queries — the reference's four pipelines re-expressed over
  * the driver testdata (FIXTURES.md §3), each oracle-checked vs DuckDB.
  */
object EtlQueries {

  /** Shared DuckDB fragment: clean_customer_name (F1) in DuckDB dialect.
    * NB the 'g' flags — Spark regexp_replace is replace-all by default. */
  private def ddbClean(x: String): String =
    s"trim(regexp_replace(regexp_replace(lower(trim($x)), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"

  /** Shared DuckDB fragment: the synthesized messy cartera report (must
    * stay in lockstep with pipelines.Cartera.rawFact). */
  private val ddbMoney =
    "format('{:,}', CAST(floor(o.o_totalprice) AS BIGINT)) || '.' || " +
      "lpad(CAST(CAST(round((o.o_totalprice - floor(o.o_totalprice)) * 100) AS BIGINT) AS VARCHAR), 2, '0')"

  private val ddbRawFact =
    s"""SELECT
       |  CASE WHEN o.o_orderkey % 101 = 0 THEN 'Walmart'
       |       WHEN o.o_orderkey % 103 = 0 THEN 'Amazon'
       |       ELSE 'NATION_' || CAST(c.c_nationkey AS VARCHAR) END AS zona_csv_original,
       |  CASE WHEN o.o_orderkey % 101 = 0 OR o.o_orderkey % 103 = 0 THEN 'Ecommerce'
       |       WHEN o.o_orderkey % 97 = 0 THEN '- no customer/project -'
       |       WHEN o.o_orderkey % 89 = 0 THEN 'ghost client ' || CAST(o.o_orderkey AS VARCHAR)
       |       ELSE '  ' || upper(c.c_name) || '!  ' END AS nombre_cliente,
       |  o.o_orderpriority AS tipo_transaccion,
       |  strftime(o.o_orderdate, '%-m/%-d/%Y') AS fecha_facturacion_raw,
       |  CAST(o.o_orderkey AS VARCHAR) AS document_number,
       |  strftime(o.o_orderdate + INTERVAL 30 DAY, '%-m/%-d/%Y') AS fecha_pago_raw,
       |  CASE WHEN o.o_orderkey % 113 = 0 THEN 'N/A'
       |       WHEN o.o_orderstatus = 'F' THEN '($$' || $ddbMoney || ')'
       |       ELSE '$$' || $ddbMoney END AS open_balance_raw
       |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin

  private val ddbEnriched =
    s"""WITH raw AS ($ddbRawFact),
       |ruled AS (
       |  SELECT *,
       |    CASE WHEN trim(zona_csv_original) = 'Walmart' AND trim(nombre_cliente) = 'Ecommerce' THEN 'E-Commerce'
       |         WHEN trim(zona_csv_original) = 'Amazon' AND trim(nombre_cliente) = 'Ecommerce' THEN 'E-Commerce'
       |         ELSE zona_csv_original END AS zona_r,
       |    CASE WHEN trim(zona_csv_original) = 'Walmart' AND trim(nombre_cliente) = 'Ecommerce' THEN 'Walmart Ecommerce'
       |         WHEN trim(zona_csv_original) = 'Amazon' AND trim(nombre_cliente) = 'Ecommerce' THEN 'Amazon'
       |         ELSE nombre_cliente END AS cliente_0
       |  FROM raw),
       |named AS (
       |  SELECT *, CASE WHEN cliente_0 = '- no customer/project -' THEN 'Sin Nombre' ELSE cliente_0 END AS cliente_r
       |  FROM ruled),
       |cleaned AS (
       |  SELECT *, ${ddbClean("cliente_r")} AS nombre_cliente_cleaned FROM named),
       |dim AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS id_cliente, CAST(c_nationkey AS BIGINT) AS id_zone,
       |         ${ddbClean("c_name")} AS nombre_cliente_cleaned
       |  FROM customer),
       |joined AS (
       |  SELECT f.*, d.id_cliente, d.id_zone
       |  FROM cleaned f LEFT JOIN dim d USING (nombre_cliente_cleaned))""".stripMargin

  val carteraLoad: Q = Q(
    "cartera_load",
    (s, dir) => pipelines.Cartera.load(s, dir, Some("2024-06-01"))
      .orderBy("document_number"),
    Some(
      s"""$ddbEnriched
         |SELECT
         |  id_cliente,
         |  COALESCE(id_zone, TRY_CAST(regexp_extract(zona_r, 'NATION_(\\d+)', 1) AS BIGINT)) AS id_zone,
         |  tipo_transaccion,
         |  strftime(strptime(fecha_facturacion_raw, '%-m/%-d/%Y'), '%Y-%m-%d') AS fecha_facturacion,
         |  document_number,
         |  strftime(strptime(fecha_pago_raw, '%-m/%-d/%Y'), '%Y-%m-%d') AS fecha_pago,
         |  COALESCE(TRY_CAST(regexp_replace(regexp_replace(trim(open_balance_raw), '\\(', '-', 'g'), '[\\)\\$$,]', '', 'g') AS DOUBLE), 0.0) AS open_balance,
         |  '2024-06-01' AS fecha_carga
         |FROM joined
         |WHERE id_cliente IS NOT NULL
         |ORDER BY document_number""".stripMargin))

  val carteraRejects: Q = Q(
    "cartera_rejects",
    (s, dir) => pipelines.Cartera.rejects(s, dir).orderBy("nombre_cliente"),
    Some(
      s"""$ddbEnriched
         |SELECT DISTINCT cliente_r AS nombre_cliente
         |FROM joined WHERE id_cliente IS NULL
         |ORDER BY nombre_cliente""".stripMargin))

  def all: Seq[Q] = Seq(carteraLoad, carteraRejects)
}
