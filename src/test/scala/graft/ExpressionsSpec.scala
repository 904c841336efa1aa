package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.etl.{Expressions => E}

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("x")
    df.select(c.as("r")).collect()(0).get(0)
  }

  /** Run a scalacheck property (deterministic seed, small batch — each
    * case is a Spark job). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(20)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(res.passed, res.status.toString)
  }

  test("F1 cleanCustomerName: reference cases") {
    val c = E.cleanCustomerName(col("x"))
    assert(eval1(c, "  ACME, Corp.  ") == "acme corp")
    assert(eval1(c, "A  B\tC") == "a b c")
    assert(eval1(c, "ñandú S.A.") == "and sa") // non-[a-z0-9\s] dropped
    assert(eval1(c, null) == null)
  }

  test("F1 idempotence: clean(clean(s)) == clean(s)") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val df = Seq(Option(s)).toDF("x")
      val row = df.select(
        E.cleanCustomerName(col("x")).as("once"),
        E.cleanCustomerName(E.cleanCustomerName(col("x"))).as("twice"))
        .collect()(0)
      row.getAs[String]("once") == row.getAs[String]("twice")
    })
  }

  test("F4 accounting money parse") {
    val c = E.parseMoneyAccounting(col("x"))
    assert(eval1(c, "($1,234.56)") == -1234.56)
    assert(eval1(c, "$1,234.56") == 1234.56)
    assert(eval1(c, " $0.09 ") == 0.09)
    assert(eval1(c, "N/A") == 0.0)
    assert(eval1(c, null) == 0.0)
  }

  test("F4 parse(render(x)) == x for 2-decimal money") {
    check(Prop.forAll(Gen.chooseNum(-999999999L, 999999999L)) { cents =>
      val x = BigDecimal(cents) / 100
      val rendered =
        if (x < 0) f"($$${-x}%,.2f)" else f"$$$x%,.2f"
      eval1(E.parseMoneyAccounting(col("x")), rendered) == x.toDouble
    })
  }

  test("F5/F6 plain money and thousands-int parse") {
    assert(eval1(E.parseMoney(col("x")), "$12,345.67 ") == 12345.67)
    assert(eval1(E.parseMoney(col("x")), "oops") == 0.0)
    assert(eval1(E.parseIntThousands(col("x")), "12,345") == 12345)
    assert(eval1(E.parseIntThousands(col("x")), null) == 0)
  }

  test("F7 truncation guards") {
    assert(eval1(E.truncate(col("x"), 5), "  abcdefgh  ") == "abcde")
    assert(eval1(E.truncateWithDefault(col("x"), 5, "dflt"), null) == "dflt")
  }

  test("F9 e-commerce conditional rewrite (cartera.py:100-108)") {
    val df = Seq(
      ("Walmart", "Ecommerce"), ("Amazon", "Ecommerce"), ("Zone 1", "Acme"))
      .toDF("zona", "cliente")
    val (z, c) = E.conditionalRewrite(col("zona"), col("cliente"), E.EcommerceRules)
    val out = df.select(z.as("z"), c.as("c")).collect()
    assert(out(0).getString(0) == "E-Commerce" && out(0).getString(1) == "Walmart Ecommerce")
    assert(out(1).getString(0) == "E-Commerce" && out(1).getString(1) == "Amazon")
    assert(out(2).getString(0) == "Zone 1" && out(2).getString(1) == "Acme")
  }

  test("D1/D5 lenient date parse with default") {
    val c = E.formatDateIso(E.dateWithDefault(E.parseDateLenient(col("x"))))
    assert(eval1(c, "6/30/2024") == "2024-06-30")
    assert(eval1(c, "2024-06-30") == "2024-06-30")
    assert(eval1(c, "INVALID") == "1900-01-01")
  }

  test("D9 month maps cover all 12 months both ways") {
    assert(E.MonthEsToEn.size == 12 && E.MonthEsToNum.size == 12)
    assert(E.MonthEsToEn("Agosto") == "August" && E.MonthEsToNum("Agosto") == 8)
  }

  test("J3 static-map lookup folds to a literal with default") {
    val df = Seq("Zone 3", "Nowhere").toDF("z")
    val out = df.select(
      graft.etl.Lookups.zoneId(col("z"), graft.etl.Lookups.ZoneMapping).as("id"))
      .collect()
    assert(out(0).getInt(0) == 3 && out(1).getInt(0) == 1)
  }

  test("P8 anyColumnContains") {
    val df = Seq(("Total row", 1.0), ("data", 2.0)).toDF("a", "b")
    val out = df.filter(!E.anyColumnContains(Seq(col("a"), col("b")), "Total"))
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "data")
  }
}
