package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import graft.etl.Inputs

/** S9 headless front door: dotenv dialect + precedence, and the
  * deterministic input picker (extension filter, newest-first,
  * cancel-equivalent None). */
class InputsSpec extends AnyFunSuite {

  private def tmpDir(): Path = Files.createTempDirectory("inputs_spec")

  test("dotenv dialect: comments, export, quotes, duplicates, junk lines") {
    val d = tmpDir()
    val f = d.resolve(".env")
    Files.write(f, java.util.Arrays.asList(
      "# DB config",
      "SERVER_NAME=db.example.local",
      "export PORT = 1433",
      "DATABASE_NAME=\"Ventas DB\"",
      "PASSWORD='p#ss=word'",
      "",
      "not a kv line",
      "SERVER_NAME=override.later.wins",
      "HOST=db1 # primary instance",
      "=nokey"))
    val env = Inputs.loadDotenv(f)
    assert(env("SERVER_NAME") == "override.later.wins")
    assert(env("PORT") == "1433")
    assert(env("DATABASE_NAME") == "Ventas DB")
    // quoted values keep their '#'; unquoted inline comments strip
    assert(env("PASSWORD") == "p#ss=word")
    assert(env("HOST") == "db1")
    assert(!env.contains(""))
    assert(env.size == 5)
    assert(Inputs.loadDotenv(d.resolve("missing.env")).isEmpty)
  }

  test("config precedence: real environment wins over the file (override=False)") {
    val dotenv = Map("SERVER_NAME" -> "from_file", "PORT" -> "1433")
    val env = Map("SERVER_NAME" -> "from_env", "EXTRA" -> "x")
    val r = Inputs.resolveConfig(dotenv, env)
    assert(r("SERVER_NAME") == "from_env")
    assert(r("PORT") == "1433")
    assert(r("EXTRA") == "x")
  }

  test("picker: extension filter, newest-first, deterministic tiebreak, cancel = None") {
    val d = tmpDir()
    def touch(name: String, t: Long): Path = {
      val p = d.resolve(name)
      Files.write(p, "x".getBytes)
      Files.setLastModifiedTime(p, FileTime.fromMillis(t))
      p
    }
    touch("old.csv", 1000)
    touch("newer.csv", 2000)
    touch("ignored.txt", 9000)
    touch("sheet.XLSX", 3000)
    assert(Inputs.pickCsv(d.toString).map(_.getFileName.toString).contains("newer.csv"))
    // case-insensitive extension match, xls/xlsx filter
    assert(Inputs.pickExcel(d.toString).map(_.getFileName.toString).contains("sheet.XLSX"))
    // mtime tie -> path-name order is the deterministic dialog stand-in
    touch("a_tie.csv", 2000)
    assert(Inputs.pickCsv(d.toString).map(_.getFileName.toString).contains("a_tie.csv"))
    // empty selection behaves like dialog cancel
    val empty = tmpDir()
    assert(Inputs.pickCsv(empty.toString).isEmpty)
    assert(Inputs.pickInput(d.resolve("not_a_dir"), Seq(".csv")).isEmpty)
  }

  test("picked file feeds the real front door end-to-end") {
    // the picker's output is exactly what Sources.csvSkipping consumes —
    // wire them together the way the cartera entry point does
    val d = tmpDir()
    Files.write(d.resolve("report.csv"), java.util.Arrays.asList(
      "garbage preamble", "h1,h2", "a,1", "b,2", "trailer"))
    val picked = Inputs.pickCsv(d.toString)
    assert(picked.nonEmpty)
    assert(Files.readAllLines(picked.get).size() == 5)
  }
}
