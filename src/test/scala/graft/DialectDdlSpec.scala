package graft

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.{Dialects, Sinks}

/** S8 dialect fidelity: the DDL the sink implies for its SQL Server
  * target (cartera.py:194 — the reference's warehouse), plus an
  * executable proof on the one real database in the sandbox (embedded
  * Derby): the Derby-dialect DDL actually creates a table the batched
  * sink round-trips through. */
class DialectDdlSpec extends SparkSpec {

  private val mssql = "jdbc:sqlserver://wh.example.invalid;database=cartera"

  // the cartera target schema a DBA would provision (SURVEY §2 S8):
  // business key, CHAR(12)-truncated name (F7), accounting money (F4),
  // zone code, lenient-parsed date (D1), load stamp (D7)
  private val carteraSchema = StructType(Seq(
    StructField("id_cliente", LongType, nullable = false),
    StructField("nombre", StringType, nullable = true),
    StructField("open_balance", DecimalType(18, 2), nullable = true),
    StructField("id_zone", IntegerType, nullable = true),
    StructField("due_date", DateType, nullable = true),
    StructField("load_ts", TimestampType, nullable = false)))

  test("T-SQL target DDL: NVARCHAR(n), DATETIME2, DATE, exact DECIMAL money") {
    val ddl = Dialects.createTableDdl(
      mssql, "dbo.cartera", carteraSchema, widths = Map("nombre" -> 12))
    assert(ddl ==
      "CREATE TABLE dbo.cartera (" +
        "\"id_cliente\" BIGINT NOT NULL, " +
        "\"nombre\" NVARCHAR(12), " +
        "\"open_balance\" DECIMAL(18,2), " +
        "\"id_zone\" INT, " +
        "\"due_date\" DATE, " +
        "\"load_ts\" DATETIME2 NOT NULL)")
  }

  test("T-SQL map covers the full pipeline type surface, unbounded text is NVARCHAR(MAX)") {
    assert(Dialects.columnType(mssql, StringType) == "NVARCHAR(MAX)")
    assert(Dialects.columnType(mssql, DoubleType) == "FLOAT")
    assert(Dialects.columnType(mssql, BooleanType) == "BIT")
    assert(Dialects.columnType(mssql, BinaryType) == "VARBINARY(MAX)")
    assert(Dialects.columnType(mssql, ShortType) == "SMALLINT")
    // money must never degrade to floating point on the warehouse side
    assert(Dialects.columnType(mssql, DecimalType(19, 4)) == "DECIMAL(19,4)")
    // no silent guessing outside the pipeline surface
    intercept[IllegalArgumentException] {
      Dialects.columnType(mssql, ArrayType(LongType))
    }
  }

  test("Derby-dialect DDL is executable and the batched sink round-trips through it") {
    import spark.implicits._
    val url = "jdbc:derby:memory:dialect_db"
    DriverManager.getConnection(s"$url;create=true").close()

    // Derby can't hold NVARCHAR(MAX); the width hint bounds the text
    // column, everything else defers to Spark's DerbyDialect
    val schema = StructType(Seq(
      StructField("id_cliente", LongType, nullable = false),
      StructField("nombre", StringType, nullable = true),
      StructField("open_balance", DecimalType(18, 2), nullable = true)))
    val ddl = Dialects.createTableDdl(
      url, "cartera_t", schema, widths = Map("nombre" -> 12))

    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); st.executeUpdate(ddl); st.close() }
    finally c.close()

    val props = new Properties()
    val df = Seq(
      (1L, "ACME CORP", BigDecimal("12.50")),
      (2L, "BETA LLC", BigDecimal("0.75")))
      .toDF("id_cliente", "nombre", "open_balance")
      .select(col("id_cliente"), col("nombre"),
        col("open_balance").cast(DecimalType(18, 2)).as("open_balance"))
    Sinks.appendBatchedJdbc(df, url, "cartera_t", props)

    val back = spark.read.jdbc(url, "cartera_t", props)
    assert(back.count() == 2)
    // DECIMAL survives the wire exactly — the F4 money contract
    val total = back.agg(sum("open_balance")).collect()(0).getDecimal(0)
    assert(total.compareTo(new java.math.BigDecimal("13.25")) == 0)
  }
}
