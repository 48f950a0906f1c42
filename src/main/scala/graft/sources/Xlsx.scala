package graft.sources

import java.io.InputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

/** Minimal XLSX (OOXML spreadsheet) parsing — JDK-only (zip + StAX), no
  * POI/openpyxl available in this environment by design.
  *
  * Covers what real submitter workbooks carry (SURVEY.md §2.1 S1;
  * verified against the three Excel-written `UI-database mappings*.xlsx`
  * under `2-Config-Files/cds_config/`): shared strings (incl. rich-text
  * runs), inline strings, numbers, booleans (`t="b"` → TRUE/FALSE display
  * form), cached formula results (`t="str"`/numeric `<v>`; the `<f>`
  * formula text is skipped), absent `r` attributes (cells fall back to
  * sequential placement), and row gaps. All values surface as STRINGS
  * exactly as serialized — the engine's string-first ingestion contract
  * (`keep_default_na=False` semantics, cds-transformation_v1.3.py:129-132).
  *
  * Date-STYLED numeric cells surface as their raw serial string by
  * default (styles are presentation, not data; a typed parse belongs
  * downstream in `Normalize.parseTimestampMulti`). Opt-in
  * `renderDates = true` reproduces the reference's observable behavior
  * instead: openpyxl converts date-styled serials to `datetime` before
  * pandas ever sees them (`cds-transformation_v1.3.py:129-132` via
  * openpyxl `from_excel`), and the stringified form — `str(datetime)`,
  * `yyyy-MM-dd HH:mm:ss` — is what the curated clean-dict keys encode
  * (`cds_clean_dict_v1.3.yaml:1240-1252`, morphology codes Excel
  * mis-typed as dates). Style-awareness = `xl/styles.xml` `cellXfs` →
  * numFmt date detection ([[XlsxDates.isDateFormat]]).
  */
object XlsxParser {

  /** Entries we need from the container. */
  final case class Workbook(
      sheets: Seq[(String, String)],       // (sheet name, entry path)
      sharedStrings: IndexedSeq[String])

  private def newReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  /** Read all rows of `sheet` (by name; empty → first sheet) from an xlsx
    * stream. Each row is an IndexedSeq[String|null] positioned by the cell
    * reference (gaps → null). */
  def readSheet(open: () => InputStream, sheet: String,
      renderDates: Boolean = false): Vector[IndexedSeq[String]] = {
    // pass 1: locate sheet entry names + shared strings (+ styles when
    // date rendering is on)
    val sheetEntries = mutable.ArrayBuffer.empty[(String, String)] // name -> rId
    val rels = mutable.Map.empty[String, String]                   // rId -> target
    var shared: IndexedSeq[String] = Vector.empty
    var dateXfs: Set[Int] = Set.empty
    withZip(open()) { (name, is) =>
      name match {
        case "xl/workbook.xml" =>
          val r = newReader(is)
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
              val nm = attr(r, "name").getOrElse("")
              val rid = attr(r, "id").getOrElse(attrNS(r, "id").getOrElse(""))
              sheetEntries += ((nm, rid))
            }
          }
        case "xl/_rels/workbook.xml.rels" =>
          val r = newReader(is)
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
              for (id <- attr(r, "Id"); tgt <- attr(r, "Target"))
                rels(id) = if (tgt.startsWith("/")) tgt.drop(1) else "xl/" + tgt
            }
          }
        case "xl/sharedStrings.xml" =>
          shared = parseSharedStrings(is)
        case "xl/styles.xml" if renderDates =>
          dateXfs = parseDateXfs(is)
        case _ => ()
      }
    }
    // a missing sheet/rel is an ERROR, never a silent fallback to
    // sheet1.xml — reading the wrong sheet's rows would flow garbage
    // through the whole pipeline undetected (and sheet1.xml need not even
    // be the workbook's first sheet; entry names follow creation order)
    val entry = (if (sheet.isEmpty) sheetEntries.headOption
      else sheetEntries.find(_._1 == sheet))
      .getOrElse(throw new IllegalArgumentException(
        if (sheet.isEmpty) "workbook has no sheets"
        else s"sheet '$sheet' not found; workbook has: " +
          sheetEntries.map(_._1).mkString(", ")))
    val target = rels.getOrElse(entry._2, throw new IllegalStateException(
      s"workbook relationship '${entry._2}' for sheet '${entry._1}' has no target"))
    // pass 2: parse the worksheet
    var rows = Vector.empty[IndexedSeq[String]]
    withZip(open()) { (name, is) =>
      if (name == target) rows = parseWorksheet(is, shared, dateXfs)
    }
    rows
  }

  /** `xl/styles.xml` → the set of `cellXfs` indices (what a cell's `s`
    * attribute points at) whose number format is a DATE format — builtin
    * ids or custom `formatCode`s ([[XlsxDates.isDateFormat]]). Only
    * `cellXfs` counts; `cellStyleXfs` is the named-style indirection
    * cells never reference directly. */
  private def parseDateXfs(is: InputStream): Set[Int] = {
    val custom = mutable.Map.empty[Int, String] // numFmtId -> formatCode
    val xfs = mutable.ArrayBuffer.empty[Int]    // cellXfs order -> numFmtId
    var inCellXfs = false
    val r = newReader(is)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            for (id <- attr(r, "numFmtId"); code <- attr(r, "formatCode"))
              custom(id.toInt) = code
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            xfs += attr(r, "numFmtId").map(_.toInt).getOrElse(0)
          case _ => ()
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ => ()
      }
    }
    xfs.zipWithIndex.collect { case (fmtId, i)
      if XlsxDates.isDateNumFmt(fmtId, custom.get(fmtId)) => i }.toSet
  }

  private def withZip(in: InputStream)(f: (String, InputStream) => Unit): Unit = {
    val z = new ZipInputStream(in)
    try {
      var e = z.getNextEntry
      while (e != null) {
        f(e.getName, z) // callers must not close z
        e = z.getNextEntry
      }
    } finally z.close()
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }
  private def attrNS(r: XMLStreamReader, name: String): Option[String] = attr(r, name)

  private def parseSharedStrings(is: InputStream): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val r = newReader(is)
    var inSi = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "si") { inSi = true; sb.clear() }
          else if (inSi && r.getLocalName == "t") sb.append(r.getElementText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          out += sb.toString; inSi = false
        case _ => ()
      }
    }
    out.toIndexedSeq
  }

  /** "B3" → 0-based column 1. */
  private[sources] def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref(i).isLetter) { c = c * 26 + (ref(i) - 'A' + 1); i += 1 }
    c - 1
  }

  private def parseWorksheet(
      is: InputStream, shared: IndexedSeq[String],
      dateXfs: Set[Int] = Set.empty): Vector[IndexedSeq[String]] = {
    val rows = mutable.ArrayBuffer.empty[IndexedSeq[String]]
    val r = newReader(is)
    var cells: mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var cellDateStyled = false
    var rowCol = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cells = mutable.ArrayBuffer.empty[String]; rowCol = 0
          case "c" if cells != null =>
            cellCol = attr(r, "r").map(colOf).getOrElse(rowCol)
            cellType = attr(r, "t").getOrElse("")
            cellDateStyled = dateXfs.nonEmpty &&
              attr(r, "s").exists(s => dateXfs.contains(s.toInt))
          case "v" | "t" if cells != null && cellCol >= 0 =>
            val raw = r.getElementText
            val value = cellType match {
              case "s" => shared.lift(raw.trim.toInt).orNull
              // t="b" serializes booleans as 0/1; Excel itself writes
              // only those, but ECMA-376 xsd:boolean also admits
              // "true"/"false" — accept both lexical forms. Surface the
              // OOXML display form (what Excel shows and what a
              // string-first reader downstream expects), not the
              // storage bit
              case "b" =>
                val b = raw.trim
                if (b == "1" || b.equalsIgnoreCase("true")) "TRUE" else "FALSE"
              // date-styled numeric cell under renderDates: the
              // openpyxl/pandas rendering, not the raw serial
              case "" | "n" if cellDateStyled =>
                XlsxDates.renderSerial(raw).getOrElse(raw)
              case _ => raw
            }
            while (cells.length <= cellCol) cells += null
            // inline strings nest <is><t>; rich text splits one cell into
            // several <r><t> runs — concatenate runs instead of keeping
            // only the last
            cells(cellCol) =
              if (cells(cellCol) == null || cellType == "s") value
              else cells(cellCol) + value
          case _ => ()
        }
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" if cells != null =>
            rows += cells.toIndexedSeq; cells = null
          case "c" => rowCol = cellCol + 1; cellCol = -1
          case _ => ()
        }
        case _ => ()
      }
    }
    rows.toVector
  }
}

/** Excel serial-date semantics, matching what openpyxl hands pandas and
  * what pandas stringifies — the observable rendering the reference's
  * curated clean-dict keys encode (`cds_clean_dict_v1.3.yaml:1240-1252`,
  * e.g. `"8041-03-01 00:00:00"` for a morphology code Excel mis-typed as
  * a date; produced at `cds-transformation_v1.3.py:129-132`).
  *
  * Conversion follows openpyxl `from_excel` (1900 date system): epoch
  * 1899-12-30, sub-day fraction rounded to whole seconds half-to-even
  * (Python `round`), serials in [0, 60) shifted back one day (the Lotus
  * leap-year compensation), pure fractions in (0, 1) rendered as a bare
  * time-of-day. `str(datetime)` form: `yyyy-MM-dd HH:mm:ss`. */
object XlsxDates {

  /** ECMA-376 builtin numFmtIds that format as dates/times (18.8.30):
    * 14–22 core date/time, 27–36 and 50–58 East Asian variants, 45/47
    * minute-second forms. 46 (`[h]:mm:ss`) is ELAPSED hours — openpyxl
    * reads it as a timedelta, not a datetime — so it stays raw. */
  private val BuiltinDateIds: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ Seq(45, 47) ++ (50 to 58)).toSet

  /** openpyxl `is_date_format` port: first format section only, quoted
    * literals and bracketed color/locale/elapsed codes stripped, any of
    * d/m/h/y/s remaining → date. Elapsed-interval formats (leading
    * `[h]`/`[m]`/`[s]`) are timedeltas, not dates. */
  private[graft] def isDateFormat(code: String): Boolean = {
    val first = code.split(";", -1)(0)
    if (first.matches("""(?i)^\[[hms]+\].*""")) false // timedelta
    else {
      val stripped = first
        .replaceAll("\"[^\"]*\"", "")
        .replaceAll("\\[[^\\]]*\\]", "")
        .replaceAll("\\\\.", "") // backslash-escaped literals
      stripped.exists(c => "dmhysDMHYS".indexOf(c.toInt) >= 0)
    }
  }

  private[graft] def isDateNumFmt(fmtId: Int, custom: Option[String]): Boolean =
    custom match {
      case Some(code) => isDateFormat(code)
      case None => BuiltinDateIds.contains(fmtId)
    }

  /** Render one serial string the way openpyxl→pandas→`str()` would;
    * None when the text is not a parseable non-negative number (cached
    * error values, negative serials) — caller keeps the raw text. */
  private[graft] def renderSerial(raw: String): Option[String] = {
    val serial =
      try raw.trim.toDouble
      catch { case _: NumberFormatException => return None }
    if (serial < 0 || serial.isNaN || serial.isInfinite) return None
    val day = math.floor(serial).toLong
    // Python round() is half-to-even -> rint
    val secs = math.rint((serial - day) * 86400d).toLong
    if (serial > 0 && serial < 1) {
      val h = secs / 3600; val m = (secs % 3600) / 60; val s = secs % 60
      Some(f"$h%02d:$m%02d:$s%02d")
    } else {
      // Lotus 1900 leap-bug window: serials below the phantom Feb 29
      // (serial 60) sit one day EARLY against the 1899-12-30 epoch —
      // serial 1 must render 1900-01-01, serial 59 → 1900-02-28
      val shift = if (day < 60) 1L else 0L
      val dt = java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
        .plusDays(day + shift).plusSeconds(secs)
      Some(dt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")))
    }
  }
}
