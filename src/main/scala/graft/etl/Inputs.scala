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
  *    with path-name tiebreak; `None` when nothing matches — the
  *    reference exits on an empty selection, and callers here abort the
  *    load the same way.
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
          else raw
        k -> v
      }
      .filter(_._1.nonEmpty)
      .toMap
  }

  /** dotenv precedence (override=False, the reference's call): the real
    * environment wins over the file for keys present in both. */
  def resolveConfig(
      dotenv: Map[String, String],
      env: Map[String, String] = sys.env): Map[String, String] =
    dotenv ++ env.view.filterKeys(dotenv.contains).toMap ++
      env.view.filterKeys(!dotenv.contains(_)).toMap

  /** The headless file picker: newest regular file under `dir` (non-
    * recursive, like a dialog's single-directory view) whose lowercase
    * name ends with one of `extensions`; newest mtime first, full path
    * descending as the deterministic tiebreak. `None` = the user hit
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

  /** Convenience: the CSV picker the cartera/pending front doors use. */
  def pickCsv(dir: String): Option[Path] =
    pickInput(Paths.get(dir), Seq(".csv"))

  /** Convenience: the Excel picker the wor2 front door uses. */
  def pickExcel(dir: String): Option[Path] =
    pickInput(Paths.get(dir), Seq(".xlsx", ".xls"))
}
