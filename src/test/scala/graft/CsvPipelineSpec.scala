package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.{Expressions => E, Sources}
import graft.pipelines.Wor

/** Integration: the S1 report scan feeding the real cleansing/lookup
  * stack — the exact path a production cartera.csv takes — plus the S4
  * classification quirk. */
class CsvPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("S1 csv -> rename -> rules -> clean -> dim join -> money parse, end to end") {
    val f = Files.createTempFile("cartera", ".csv")
    Files.writeString(f,
      """Reporte de Cartera
        |Generado: 2024-06-01
        |Usuario: sistema
        |Filtros: ninguno
        |Moneda: USD
        |
        |Zones for Financial Reporting ,Customer:Project ,Open Balance
        |Walmart,Ecommerce,"$1,250.00"
        |Zone 1,  ACME CORP.  ,"($2,500.50)"
        |Zone 2,- no customer/project -,N/A
        |Zone 3,Ghost Client 77,"$10.00"
        |TOTALES,,,
        |""".stripMargin)
    val raw = Sources.csvSkipping(spark, f.toString, preamble = 6, footer = 1)
    val renamed = Sources.renameTolerant(raw, Map(
      "Zones for Financial Reporting " -> "zona",
      "Customer:Project " -> "cliente",
      "Open Balance" -> "balance_raw"))
    val (zonaR, clienteR) = E.conditionalRewrite(
      col("zona"), col("cliente"), E.EcommerceRules)
    val dim = Seq((1L, "acme corp"), (2L, "walmart ecommerce"))
      .toDF("id_cliente", "nombre_cliente_cleaned")
    val out = renamed
      .withColumn("zona_r", zonaR)
      .withColumn("cliente_r", E.replaceLiteral(clienteR,
        "- no customer/project -", "Sin Nombre"))
      .withColumn("nombre_cliente_cleaned", E.cleanCustomerName(col("cliente_r")))
      .join(broadcast(dim), Seq("nombre_cliente_cleaned"), "left")
      .withColumn("open_balance", E.parseMoneyAccounting(col("balance_raw")))
      .orderBy("zona_r")
      .collect()

    assert(out.length == 4)
    val byZona = out.map(r => r.getAs[String]("zona_r") -> r).toMap
    // e-commerce rule fired and matched the dim
    assert(byZona("E-Commerce").getAs[String]("cliente_r") == "Walmart Ecommerce")
    assert(byZona("E-Commerce").getAs[Long]("id_cliente") == 2L)
    // accounting negative parsed, dirty name matched after cleaning
    assert(byZona("Zone 1").getAs[Double]("open_balance") == -2500.50)
    assert(byZona("Zone 1").getAs[Long]("id_cliente") == 1L)
    // literal replacement + unparseable balance -> 0.0, unmatched -> null id
    assert(byZona("Zone 2").getAs[String]("cliente_r") == "Sin Nombre")
    assert(byZona("Zone 2").getAs[Double]("open_balance") == 0.0)
    assert(byZona("Zone 2").isNullAt(byZona("Zone 2").fieldIndex("id_cliente")))
    assert(byZona("Zone 3").isNullAt(byZona("Zone 3").fieldIndex("id_cliente")))
  }

  test("S4 classification: Proyeccion_Vendedor matches the regex but no bucket (quirk 2)") {
    val df = Seq(
      "Avancedeventa_Category_Zone3_Enero",
      "Forecast_KamEast_Mayo",
      "Proyeccion_Vendedor_Zone1_Agosto",
      "Forecast_Zone9_Mayo", // zone outside [1-6] — no match
      "SomethingElse").toDF("t")
    val out = df.select(Wor.classifyTable(col("t")).as("bucket"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(
      Some("category"), Some("forecast"), None, None, None))
  }
}
