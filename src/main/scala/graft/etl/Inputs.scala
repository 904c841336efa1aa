package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** S9 — the reference's front door, headless: `.env` config loading and
  * input-file selection (cartera.py:14-25,53-65; wor2.py:81-91).
  *
  * The reference opens a Tk file dialog and loads DB config via
  * python-dotenv. A batch engine keeps the SEMANTICS and drops the
  * rendering:
  *
  *  - [[loadDotenv]] parses the same KEY=VALUE file dialect python-dotenv
  *    reads (comments, blanks, `export` prefixes, quoted values), and
  *    [[resolveConfig]] applies dotenv's default precedence: a variable
  *    already present in the real environment WINS over the file
  *    (load_dotenv(override=False) — what the reference calls).
  *  - [[pickInput]] replaces the dialog with a deterministic policy:
  *    newest file in a directory matching the same extension filters
  *    the dialogs pass ("*.csv" / "*.xlsx *.xls"), mtime descending
  *    with ascending path-name tiebreak; `None` when nothing matches —
  *    the reference exits on an empty selection, and a caller composing
  *    this with the pipelines aborts the load the same way (the
  *    pipelines themselves keep taking resolved paths as parameters;
  *    InputsSpec drives the composition end-to-end).
  *
  * This is driver-side file-system plumbing (one directory listing per
  * load), not a data-path operator — nothing here touches an executor.
  */
object Inputs {

  /** Parse a `.env` file: `KEY=VALUE` lines; blank lines and `#`
    * comments skipped; optional `export ` prefix; surrounding single or
    * double quotes stripped from the value; whitespace trimmed on both
    * sides. Later duplicate keys win (dotenv file-order semantics). */
  def loadDotenv(path: Path): Map[String, String] = {
    if (!Files.isRegularFile(path)) return Map.empty
    Files.readAllLines(path).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val body = if (l.startsWith("export ")) l.drop(7).trim else l
        val i = body.indexOf('=')
        val k = body.take(i).trim
        val raw = body.drop(i + 1).trim
        val v =
          if (raw.length >= 2 &&
            ((raw.head == '"' && raw.last == '"') ||
              (raw.head == '\'' && raw.last == '\''))) raw.tail.init
          else {
            // python-dotenv strips UNQUOTED inline comments
            // ("PORT=1433 # note" -> "1433"); quoted values above keep
            // their # verbatim
            val c = raw.indexOf(" #")
            (if (c >= 0) raw.take(c) else raw).trim
          }
        k -> v
      }
      .filter(_._1.nonEmpty)
      .toMap
  }

  /** dotenv precedence (override=False, the reference's call): the real
    * environment wins over the file for keys present in both — i.e. the
    * file only SUPPLIES defaults. */
  def resolveConfig(
      dotenv: Map[String, String],
      env: Map[String, String] = sys.env): Map[String, String] =
    dotenv ++ env

  /** The headless file picker: newest regular file under `dir` (non-
    * recursive, like a dialog's single-directory view) whose lowercase
    * name ends with one of `extensions`; newest mtime first, full path
    * ASCENDING as the deterministic tiebreak. `None` = the user hit
    * cancel — callers must abort the load (the reference exits). */
  def pickInput(dir: Path, extensions: Seq[String]): Option[Path] = {
    if (!Files.isDirectory(dir)) return None
    val exts = extensions.map(_.toLowerCase.stripPrefix("*"))
    val listing = Files.list(dir)
    try {
      listing.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filter(p => exts.exists(p.getFileName.toString.toLowerCase.endsWith))
        .toSeq
        .sortBy(p => (-Files.getLastModifiedTime(p).toMillis, p.toString))
        .headOption
    } finally listing.close()
  }

  /** Convenience: the filter the cartera/pending CSV dialogs pass.
    * (The pipelines themselves take resolved paths as parameters —
    * these helpers are the headless front door a caller composes with
    * them, exercised end-to-end by InputsSpec.) */
  def pickCsv(dir: String): Option[Path] =
    pickInput(Paths.get(dir), Seq(".csv"))

  /** Convenience: the filter the wor2 Excel dialog passes. */
  def pickExcel(dir: String): Option[Path] =
    pickInput(Paths.get(dir), Seq(".xlsx", ".xls"))
}
