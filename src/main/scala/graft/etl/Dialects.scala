package graft.etl

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** JDBC dialect type mapping for the S8 warehouse sink — the DDL the
  * sink implies for its target table per database dialect.
  *
  * The reference appends into a pre-existing SQL Server table
  * (cartera.py:194, SQLAlchemy `to_sql if_exists='append'`); the only
  * reference-fidelity daylight left in the sink is the T-SQL shape of
  * that target. This module states it executably: given the Spark
  * schema the pipeline produces, emit the `CREATE TABLE` a DBA would
  * run — NVARCHAR(n) for bounded text (NVARCHAR(MAX) when unbounded),
  * DATETIME2 for timestamps (SQL Server's full-precision type;
  * legacy DATETIME rounds to 3.33 ms and silently corrupts load-stamp
  * dedup keys), DATE for dates, and exact DECIMAL(p,s) for money
  * (never FLOAT — the accounting parser F4/F5 produces 2-decimal
  * values that must round-trip bit-exact through the warehouse).
  *
  * For every other dialect the mapping defers to Spark's own
  * `JdbcDialects` registry (the same lookup the `df.write.jdbc` path
  * uses), so the DDL here is exactly what the sink's CreateTable would
  * emit — proven executable against embedded Derby in
  * `DialectDdlSpec`.
  */
object Dialects {

  /** Per-column width hints: name → max chars, for dialects where
    * bounded text should be declared bounded (CHAR(n)-truncated F7
    * columns have a known width; everything else gets the unbounded
    * type). */
  type Widths = Map[String, Int]

  private def isSqlServer(url: String): Boolean =
    url.startsWith("jdbc:sqlserver")

  /** T-SQL type for one Spark field. Kept total over the types the
    * pipelines emit; anything exotic fails fast rather than guessing. */
  private[etl] def tsqlType(dt: DataType, width: Option[Int]): String = dt match {
    case StringType => width.fold("NVARCHAR(MAX)")(w => s"NVARCHAR($w)")
    case TimestampType | TimestampNTZType => "DATETIME2"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case DoubleType => "FLOAT"
    case FloatType => "REAL"
    case BooleanType => "BIT"
    case BinaryType => "VARBINARY(MAX)"
    case other =>
      throw new IllegalArgumentException(
        s"no T-SQL mapping for Spark type ${other.simpleString}")
  }

  /** Column type per the target database's dialect: our T-SQL map for
    * SQL Server, Spark's `JdbcDialects` entry otherwise (with the
    * JDBC common-type fallback Spark applies when a dialect has no
    * opinion). Width hints bound VARCHAR on non-T-SQL targets too. */
  def columnType(url: String, dt: DataType, width: Option[Int] = None): String =
    if (isSqlServer(url)) tsqlType(dt, width)
    else (dt, width) match {
      case (StringType, Some(w)) => s"VARCHAR($w)"
      case _ =>
        val dialect = JdbcDialects.get(url)
        dialect.getJDBCType(dt).map(_.databaseTypeDefinition).getOrElse {
          // JDBC common types (the same fallback table Spark's JDBC
          // writer uses when the dialect is silent)
          dt match {
            case IntegerType => "INTEGER"
            case LongType => "BIGINT"
            case DoubleType => "DOUBLE PRECISION"
            case FloatType => "REAL"
            case ShortType => "SMALLINT"
            case ByteType => "BYTE"
            case BooleanType => "BIT(1)"
            case StringType => "TEXT"
            case BinaryType => "BLOB"
            case TimestampType => "TIMESTAMP"
            case DateType => "DATE"
            case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
            case other => throw new IllegalArgumentException(
              s"no JDBC mapping for Spark type ${other.simpleString}")
          }
        }
    }

  /** The `CREATE TABLE` the S8 target implies for `schema` on the
    * database behind `url`. Identifiers are quoted with the dialect's
    * own quoting; non-nullable Spark fields become NOT NULL columns. */
  def createTableDdl(
      url: String, table: String, schema: StructType,
      widths: Widths = Map.empty): String = {
    val dialect = JdbcDialects.get(url)
    val cols = schema.fields.map { f =>
      val t = columnType(url, f.dataType, widths.get(f.name))
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${dialect.quoteIdentifier(f.name)} $t$nn"
    }
    s"CREATE TABLE $table (${cols.mkString(", ")})"
  }
}
