package graft

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.functions._

/** Read-side JDBC pushdown pins (round-10 verdict task 4). The
  * reference reads two shapes over the SQL wire and SURVEY §4.4 claims
  * Spark's JDBC relation prunes/pushes them — these tests make that a
  * plan-pinned fact against embedded Derby, beside `JdbcSinkSpec`'s
  * write-path pins:
  *
  *   - the dim scan: `SELECT id_cliente, nombre_cliente, id_zone FROM
  *     clientes` (cartera.py:115-116) — a 3-column projection of a
  *     wider table; the unread columns must never cross the wire
  *   - the existing-keys scan: `SELECT <dedup keys> FROM <target>`
  *     (ventas_totales.py:176-181) — the anti-join's key-only read,
  *     plus the incremental predicate a batch-windowed load adds
  *
  * At 100 TB the warehouse target is the big side: fetching whole rows
  * to filter/prune in Spark would move the table; these pins are what
  * makes the S5/S6 JDBC variants scale-safe. */
class JdbcReadSpec extends SparkSpec {

  private val props = new Properties()

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name"
    DriverManager.getConnection(s"$url;create=true").close()
    url
  }

  private def ddl(url: String, sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); st.executeUpdate(sql); st.close() }
    finally c.close()
  }

  test("S5 dim read: the 3-column dim projection prunes the wide columns off the wire") {
    val url = freshDb("dim_read_db")
    ddl(url, "CREATE TABLE clientes (id_cliente BIGINT, nombre_cliente VARCHAR(128), " +
      "id_zone INT, notas_internas VARCHAR(512), balance DOUBLE)")
    ddl(url, "INSERT INTO clientes VALUES " +
      "(1, 'ACME Corp', 10, 'x', 1.0), (2, 'Amazon', 20, 'y', 2.0), (3, 'Zeta', 10, 'z', 3.0)")
    val t = spark.read.jdbc(url, "clientes", props)
    // Derby reports uppercase identifiers — resolve names as read
    def c(n: String) = t.columns.find(_.equalsIgnoreCase(n)).get
    val dim = t.select(c("id_cliente"), c("nombre_cliente"), c("id_zone"))
    val plan = dim.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    // the dim columns are read; the wide unread ones never appear
    for (col <- Seq("ID_CLIENTE", "NOMBRE_CLIENTE", "ID_ZONE"))
      assert(plan.toUpperCase.contains(col), plan)
    for (col <- Seq("NOTAS_INTERNAS", "BALANCE"))
      assert(!plan.toUpperCase.contains(col), plan)
    assert(dim.count() == 3)
  }

  test("S6 existing-keys read: key projection + incremental predicate both reach the source") {
    val url = freshDb("keys_read_db")
    ddl(url, "CREATE TABLE ventas (doc_id BIGINT, linea INT, fecha DATE, " +
      "cliente VARCHAR(64), monto DOUBLE)")
    ddl(url, "INSERT INTO ventas VALUES " +
      "(1, 1, DATE('2024-01-05'), 'a', 10.0), (1, 2, DATE('2024-02-06'), 'b', 20.0), " +
      "(2, 1, DATE('2025-01-07'), 'c', 30.0), (3, 1, DATE('2025-03-08'), 'd', 40.0)")
    val t = spark.read.jdbc(url, "ventas", props)
    def c(n: String) = t.columns.find(_.equalsIgnoreCase(n)).get
    val keys = t
      .filter(col(c("fecha")) >= lit("2025-01-01").cast("date"))
      .select(c("doc_id"), c("linea"), c("fecha"))
    val plan = keys.queryExecution.executedPlan.toString
    // predicate reached the source (fetched rows are only the window)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.toUpperCase.contains("GREATERTHANOREQUAL(FECHA"), plan)
    // projection pruned to the dedup keys — payload never crosses
    for (col <- Seq("CLIENTE", "MONTO"))
      assert(!plan.toUpperCase.contains(col), plan)
    assert(keys.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }
}
