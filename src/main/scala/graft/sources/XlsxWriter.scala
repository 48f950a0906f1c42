package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** Minimal CONFORMANT OOXML (SpreadsheetML) workbook writer — the inverse
  * of [[XlsxParser]]: one worksheet of inline-string cells per sheet,
  * header row first, null cells omitted (a gap reads back as null). The
  * package carries the parts OPC interchange requires (a populated
  * `[Content_Types].xml` with Default/Override entries and a root
  * `_rels/.rels` pointing at `xl/workbook.xml`), so output opens in any
  * OOXML consumer, not just the in-repo parser.
  *
  * Driver-side by design: a workbook is a single zip, not a splittable
  * sink, and the reference's unit of exchange is the per-study workbook
  * (~10⁴–10⁵ rows — `cds-transformation_v1.3.py:129-132`), which fits a
  * driver comfortably. This is the fixture/interchange path; the
  * data-plane sinks are TSV/JSONL/parquet. [[MaxRows]] (the xlsx format's
  * own per-sheet row limit) bounds the driver collect — a larger frame
  * fails loudly instead of OOMing the driver; route such frames to the
  * data-plane sinks instead.
  *
  * Writes are atomic: the zip is streamed to a temp file in the target
  * directory and renamed into place, so a crash mid-write never leaves a
  * truncated workbook for an s2-style batch-dir glob consumer to choke on.
  */
object XlsxWriter {

  /** xlsx per-sheet row capacity (2²⁰, including the header row) — also
    * the loud upper bound on the driver-side collect. */
  val MaxRows: Int = 1 << 20

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      // a RAW carriage return would be normalized to LF by any conforming
      // XML parser on read-back (XML 1.0 §2.11) — the character reference
      // survives, keeping the writer→reader roundtrip byte-faithful
      case '\r' => "&#xD;"
      // other C0 controls are ILLEGAL in XML 1.0 even as character
      // references; they cannot be represented in a workbook and are
      // dropped (deliberate lossy edge, matching what Excel itself does)
      case c if c < ' ' && c != '\t' && c != '\n' => ""
      case c => c.toString
    }

  /** A1-style column name: 0→A, 25→Z, 26→AA. */
  private[graft] def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  /** Write `df` (collected to the driver — workbook-sized frames only) as
    * a single-sheet xlsx at `path`. Every cell is rendered string-first
    * via `toString`, matching the reader's string-first contract. */
  def writeWorkbook(df: DataFrame, path: String, sheet: String = "Metadata"): Unit =
    writeWorkbookSheets(Seq(sheet -> df), path)

  /** Multi-sheet workbook — the reference's actual exchange shape (a
    * per-study workbook carries Metadata plus auxiliary sheets, selected
    * by name on read; `cds_config_example_v1.3.yaml` names the sheet per
    * study). Sheets are written in the given order; names must be
    * distinct ([[XlsxParser.readSheet]] resolves by name). */
  def writeWorkbookSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeWorkbookSheets: at least one sheet")
    require(sheets.map(_._1).distinct.size == sheets.size,
      s"writeWorkbookSheets: duplicate sheet names in ${sheets.map(_._1)}")

    def sheetXml(df: DataFrame): String = {
      val cols = df.columns.toIndexedSeq
      // limit(MaxRows) bounds the collect itself: the guard must fire
      // BEFORE an oversized frame fills the driver heap, not after
      val data = df.limit(MaxRows).collect().map { r =>
        cols.indices.map(i => Option(r.get(i)).map(_.toString).orNull)
      }
      require(data.length < MaxRows,
        s"writeWorkbookSheets: frame has >= $MaxRows rows — exceeds the " +
          "xlsx sheet capacity (and the driver-side collect budget); " +
          "write workbook-sized frames only, or use the TSV/JSONL/parquet sinks")
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\"?>\n"
      sb ++= "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">\n  <sheetData>\n"
      def row(rowIdx: Int, cells: IndexedSeq[String]): Unit = {
        sb ++= s"""    <row r="$rowIdx">"""
        cells.zipWithIndex.foreach { case (v, ci) =>
          if (v != null)
            sb ++= s"""<c r="${colRef(ci)}$rowIdx" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
        }
        sb ++= "</row>\n"
      }
      row(1, cols)
      data.zipWithIndex.foreach { case (cells, i) => row(i + 2, cells) }
      sb ++= "  </sheetData>\n</worksheet>"
      sb.toString
    }

    // collect and render EVERY sheet before the file is opened: a failed
    // collect (executor loss, analysis error) must leave no truncated
    // workbook behind — a batch-dir glob consumer would otherwise feed
    // the corrupt zip to the parser on its next scan
    val rendered = sheets.map { case (_, df) => sheetXml(df) }

    // atomic publish: stream the zip to a temp file in the TARGET directory
    // (same filesystem, so the rename is atomic), move into place last — a
    // crash mid-write leaves only a dot-temp no glob consumer matches
    val target = java.nio.file.Paths.get(path).toAbsolutePath
    val tmp = java.nio.file.Files.createTempFile(
      target.getParent, s".${target.getFileName}.", ".tmp")
    val z = new ZipOutputStream(new FileOutputStream(tmp.toFile))
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    var moved = false
    try {
      val overrides = sheets.indices.map { i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
      }.mkString
      entry("[Content_Types].xml",
        s"""<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>$overrides</Types>""")
      entry("_rels/.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
      val decls = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      entry("xl/workbook.xml",
        s"""<?xml version="1.0"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
           |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |  <sheets>$decls</sheets>
           |</workbook>""".stripMargin)
      val rels = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      entry("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
           |  $rels
           |</Relationships>""".stripMargin)
      rendered.zipWithIndex.foreach { case (xml, i) =>
        entry(s"xl/worksheets/sheet${i + 1}.xml", xml)
      }
      z.close()
      try java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        // some filesystems reject ATOMIC_MOVE+REPLACE together; a plain
        // replace is still a rename on the same directory
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      moved = true
    } finally {
      // idempotent on the success path; on the failure path it must not
      // mask the original exception (close of a half-written zip can throw)
      try z.close() catch { case _: java.io.IOException => () }
      if (!moved) java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}
