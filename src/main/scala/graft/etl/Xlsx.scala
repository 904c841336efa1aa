package graft.etl

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3/S4 — a real `.xlsx` reader for the named-table subset the
  * reference uses (wor2.py:95,104-160: `load_workbook(data_only=True)`,
  * iterate each sheet's tables, slice the table's cell range, first row
  * = header).
  *
  * An xlsx file is a zip of XML parts; the named-table subset needs
  * five of them: `xl/workbook.xml` (sheet names → relationship ids),
  * `xl/_rels/workbook.xml.rels` (relationship ids → sheet parts),
  * `xl/sharedStrings.xml` (the string pool), each sheet part's cell
  * grid, and each sheet's `_rels` (sheet → `xl/tables/tableN.xml`,
  * which carries the table `name` and `ref` range). All parsed with
  * `java.util.zip` + the JDK StAX streaming parser — no POI, no
  * dependency, offline-safe.
  *
  * `data_only=True` semantics: a formula cell (`<f>…</f><v>cached</v>`)
  * yields its cached `<v>` value, exactly what the reference sees.
  *
  * Scale shape: ONE workbook is a driver-side object for the reference
  * (a few MB, openpyxl loads it in memory too) — [[readTables]] mirrors
  * that. A 100 TB ingest arrives as MANY workbooks, so the distributed
  * face is [[scanWorkbooks]]: `binaryFiles` ships each workbook's bytes
  * to an executor, the parse runs per-file in parallel, and the result
  * is a long-format DataFrame (one row per table data row) that
  * [[bucketDF]] pivots into a homogeneous bucket for the Wor cleans.
  * Parallelism = number of workbooks; no single file ever needs to
  * split (sheet XML streams, it is never DOM-materialized).
  */
object Xlsx {

  /** One named table: `sheet`/`name` identify it (the classification
    * regex runs on `name`), `header` is the range's first row, `rows`
    * the rest in sheet order (absent cells are null — pandas NaN). */
  final case class Table(
      sheet: String, name: String,
      header: Seq[String], rows: Seq[Seq[String]])

  // ------------------------------------------------------------ zip layer

  private def entries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.toMap
  }

  // ------------------------------------------------------------ xml layer

  private def reader(xml: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // hygiene: the workbook is untrusted input — no DTDs, no entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] =
    (0 until r.getAttributeCount)
      .find(i => r.getAttributeLocalName(i) == name)
      .map(r.getAttributeValue)

  /** sharedStrings.xml → the string pool (rich-text runs concatenated).
    * Phonetic-guide runs (`<rPh><t>…`, furigana) are skipped — openpyxl's
    * string view excludes them, so concatenating them would diverge from
    * what the reference reads. */
  private def sharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val r = reader(xml)
    val out = IndexedSeq.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    var inRPh = false
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
        cur = new StringBuilder
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "rPh" =>
        inRPh = true
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" =>
        inT = cur != null && !inRPh
      case XMLStreamConstants.CHARACTERS if inT =>
        cur.append(r.getText)
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "t" =>
        inT = false
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "rPh" =>
        inRPh = false
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
        out += cur.toString; cur = null
      case _ =>
    }
    r.close()
    out.result()
  }

  /** A `.rels` part → Map(relationship id → target path). */
  private def rels(xml: Array[Byte]): Map[String, String] = {
    val r = reader(xml)
    val out = mutable.Map.empty[String, String]
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "Relationship" =>
        for (id <- attr(r, "Id"); tgt <- attr(r, "Target")) out(id) = tgt
      case _ =>
    }
    r.close()
    out.toMap
  }

  /** workbook.xml → Seq((sheet name, relationship id)) in file order. */
  private def workbookSheets(xml: Array[Byte]): Seq[(String, String)] = {
    val r = reader(xml)
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "sheet" =>
        for (n <- attr(r, "name"); rid <- attr(r, "id")) out += (n -> rid)
      case _ =>
    }
    r.close()
    out.result()
  }

  /** A worksheet part → cell grid Map((row, col) → value), 1-based,
    * shared strings resolved, inline strings and cached formula values
    * handled (`data_only=True`).
    *
    * Cell addressing: `c@r` is OPTIONAL per the OOXML schema — streaming
    * writers omit it, meaning "next column of the current row" (and
    * `row@r` likewise defaults to "next row"), so implicit positions are
    * tracked. The cell's value is written once, at `</c>`: a rich-text
    * inline string (`<is><r><t>…` runs) accumulates across runs the way
    * openpyxl concatenates them, and formula cells contribute only their
    * cached `<v>`. */
  private def sheetCells(
      xml: Array[Byte], sst: IndexedSeq[String]): Map[(Int, Int), String] = {
    val r = reader(xml)
    val out = mutable.Map.empty[(Int, Int), String]
    var curRow = 0     // last row index seen (1-based)
    var curCol = 0     // last column index filled within the row
    var cellCol = 0    // this cell's resolved column
    var inCell = false
    var cellType = ""
    var capture = false  // inside <v>, or inside <is>…<t>
    var inIs = false
    var sawValue = false // a <v> or <is> appeared — "" is a real value,
                         // distinct from a cell with no value element
    val buf = new StringBuilder
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          curRow = attr(r, "r").map(_.toInt).getOrElse(curRow + 1)
          curCol = 0
        case "c" =>
          attr(r, "r").map(parseRef) match {
            case Some((rr, cc)) => curRow = rr; cellCol = cc
            case None => cellCol = curCol + 1
          }
          inCell = true
          cellType = attr(r, "t").getOrElse("")
          sawValue = false
          buf.clear()
        case "v" if inCell => capture = true; sawValue = true
        case "is" if inCell => inIs = true; sawValue = true
        case "t" if inIs => capture = true
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if capture => buf.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => capture = false
        case "t" => capture = false
        case "is" => inIs = false
        case "c" =>
          if (inCell && sawValue) {
            val raw = buf.toString
            if (cellType == "s") {
              // an empty <v/> under t="s" has no pool index to resolve
              if (raw.trim.nonEmpty) out((curRow, cellCol)) = sst(raw.trim.toInt)
            } else if (raw.nonEmpty || cellType == "inlineStr" || cellType == "str") {
              // an empty <v/> on a numeric/untyped cell is an absent
              // value (openpyxl yields None); only the string-typed
              // cell kinds can legitimately hold the empty string
              out((curRow, cellCol)) = raw
            }
          }
          curCol = cellCol
          inCell = false
          buf.clear()
        case _ =>
      }
      case _ =>
    }
    r.close()
    out.toMap
  }

  /** "BC23" → (row 23, col 55), 1-based. */
  private[etl] def parseRef(ref: String): (Int, Int) = {
    val letters = ref.takeWhile(_.isLetter)
    val digits = ref.drop(letters.length)
    val colNum = letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1))
    (digits.toInt, colNum)
  }

  /** xl/tables/tableN.xml → (name, ref range). */
  private def tableMeta(xml: Array[Byte]): Option[(String, String)] = {
    val r = reader(xml)
    var out: Option[(String, String)] = None
    while (r.hasNext && out.isEmpty) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "table" =>
        out = for (n <- attr(r, "name"); ref <- attr(r, "ref")) yield (n, ref)
      case _ =>
    }
    r.close()
    out
  }

  private val NumberedPart = "^(.*?)(\\d+)\\.xml$".r

  /** Sort key putting "…/table2.xml" before "…/table10.xml". */
  private[etl] def tablePartKey(path: String): (String, Long) = path match {
    case NumberedPart(stem, num) => (stem, num.toLong)
    case _ => (path, Long.MaxValue)
  }

  /** Resolve a rels target ("worksheets/sheet1.xml", "../tables/t1.xml",
    * "/xl/…") against a base directory inside the zip. */
  private def resolve(base: String, target: String): String =
    if (target.startsWith("/")) target.drop(1)
    else {
      val parts = mutable.ArrayBuffer((base + "/" + target).split("/").toSeq: _*)
      var i = 0
      while (i < parts.length)
        if (parts(i) == ".") { parts.remove(i) }
        else if (parts(i) == ".." && i > 0) { parts.remove(i - 1, 2); i -= 1 }
        else i += 1
      parts.mkString("/")
    }

  // ------------------------------------------------------- workbook layer

  /** All named tables of a workbook, in (sheet, table-part) order —
    * the `load_workbook` + `sheet.tables` traversal of wor2.py:119-160. */
  def readTables(bytes: Array[Byte]): Seq[Table] = {
    val parts = entries(bytes)
    val sst = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)
    val wbRels = parts.get("xl/_rels/workbook.xml.rels")
      .map(rels).getOrElse(Map.empty)
    val sheets = parts.get("xl/workbook.xml")
      .map(workbookSheets).getOrElse(Seq.empty)
    sheets.flatMap { case (sheetName, rid) =>
      wbRels.get(rid).toSeq.flatMap { sheetTarget =>
        val sheetPath = resolve("xl", sheetTarget)
        val cells = parts.get(sheetPath)
          .map(sheetCells(_, sst)).getOrElse(Map.empty)
        val relsPath = {
          val dir = sheetPath.substring(0, sheetPath.lastIndexOf('/'))
          val file = sheetPath.substring(sheetPath.lastIndexOf('/') + 1)
          s"$dir/_rels/$file.rels"
        }
        val sheetDir = sheetPath.substring(0, sheetPath.lastIndexOf('/'))
        parts.get(relsPath).map(rels).getOrElse(Map.empty)
          .values.toSeq
          .map(resolve(sheetDir, _))
          .filter(_.startsWith("xl/tables/"))
          // numeric-suffix order: writers name parts table1..tableN in
          // workbook order, and a lexicographic sort would put table10
          // before table2 once a sheet holds ≥10 tables
          .sortBy(tablePartKey)
          .flatMap(p => parts.get(p))
          .flatMap(tableMeta)
          .map { case (name, ref) =>
            // single-cell refs ("A1") are legal ST_Ref: from == to
            val (from, to) = ref.split(":", 2) match {
              case Array(f, t) => (f, t)
              case Array(f) => (f, f)
            }
            val (r1, c1) = parseRef(from)
            val (r2, c2) = parseRef(to)
            val grid = (r1 to r2).map(r =>
              (c1 to c2).map(c => cells.get((r, c)).orNull))
            Table(sheetName, name, grid.head.map(Option(_).getOrElse("")),
              grid.tail)
          }
      }
    }
  }

  /** Local-file convenience. */
  def readTables(path: String): Seq[Table] =
    readTables(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** Distributed workbook scan: every named table's data rows across all
    * workbooks under `path` (glob ok), one output row per table row —
    * `(workbook, sheet, table_name, row_idx, header, cells)`. Parse runs
    * on executors, one task per workbook; `row_idx` is the in-table
    * position (0 = first data row), which downstream positional rules
    * (P9 "row 0 is the zone-quota row") need to be deterministic. */
  def scanWorkbooks(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, stream) =>
        val bytes = stream.toArray()
        readTables(bytes).flatMap { t =>
          t.rows.zipWithIndex.map { case (cells, i) =>
            (file, t.sheet, t.name, i.toLong, t.header, cells)
          }
        }
      }
      .toDF("workbook", "sheet", "table_name", "row_idx", "header", "cells")
  }

  /** Pivot a homogeneous bucket of [[scanWorkbooks]] rows into named
    * columns: position i of `cells` becomes `columnNames(i)`. The caller
    * groups tables into buckets first (classification regex on
    * `table_name`) — within a bucket headers are positionally uniform,
    * exactly the assumption wor2.py's per-bucket concat makes. */
  def bucketDF(scan: DataFrame, columnNames: Seq[String]): DataFrame = {
    // try_element_at: a narrower table (missing trailing columns) pads
    // null like the reference's pandas concat — plain element_at would
    // throw INVALID_ARRAY_INDEX under Spark 4's default ANSI mode.
    val dataCols = columnNames.zipWithIndex.map { case (n, i) =>
      try_element_at(col("cells"), lit(i + 1)).as(n)
    }
    scan.select(dataCols :+ col("table_name") :+ col("row_idx"): _*)
  }
}
