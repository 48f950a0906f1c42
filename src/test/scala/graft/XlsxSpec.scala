package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.pipeline.Pipeline
import graft.pipeline.Pipeline.NodeSpec

/** The native xlsx DataSource V2: a workbook constructed from raw OOXML
  * parts is read back through `spark.read.format("xlsx")`, string-first,
  * and feeds the pipeline end-to-end (the reference's actual input path).
  */
class XlsxSpec extends SparkSpec {

  private def writeXlsx(path: String, sheetName: String,
                        shared: Seq[String], sheetXml: String,
                        styles: String = null): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    if (styles != null) entry("xl/styles.xml", styles)
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      s"""<?xml version="1.0"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |  <sheets><sheet name="$sheetName" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |${shared.map(s => s"  <si><t>$s</t></si>").mkString("\n")}
         |</sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml", sheetXml)
    z.close()
  }

  // 3 columns: phs_accession (shared str), participant_id (inline str),
  // age (number) — covers all three cell encodings; row 3 has a gap in B.
  private def sheetXml =
    """<?xml version="1.0"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |  <sheetData>
      |    <row r="1">
      |      <c r="A1" t="s"><v>0</v></c>
      |      <c r="B1" t="s"><v>1</v></c>
      |      <c r="C1" t="s"><v>2</v></c>
      |    </row>
      |    <row r="2">
      |      <c r="A2" t="s"><v>3</v></c>
      |      <c r="B2" t="inlineStr"><is><t>p1</t></is></c>
      |      <c r="C2"><v>25.0</v></c>
      |    </row>
      |    <row r="3">
      |      <c r="A3" t="s"><v>3</v></c>
      |      <c r="C3"><v>31</v></c>
      |    </row>
      |  </sheetData>
      |</worksheet>""".stripMargin

  private lazy val xlsxPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_spec").toString
    val p = s"$dir/study1.xlsx"
    writeXlsx(p, "Metadata",
      Seq("phs_accession", "participant_id", "age", "phs001"), sheetXml)
    p
  }

  test("xlsx connector reads header, shared/inline strings, raw numbers") {
    val df = spark.read.format("xlsx").option("sheet", "Metadata").load(xlsxPath)
    assert(df.columns.toSeq == Seq("phs_accession", "participant_id", "age"))
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set(
      ("phs001", "p1", "25.0"),    // number kept verbatim as serialized
      ("phs001", null, "31")))     // gap in column B -> null
  }

  test("short-name registration resolves format(\"xlsx\")") {
    // also covers default sheet (first) when no option given
    val df = spark.read.format("xlsx").load(xlsxPath)
    assert(df.count() == 2)
  }

  test("a missing sheet name errors with the available sheets, never falls back") {
    val e = intercept[Exception] {
      spark.read.format("xlsx").option("sheet", "Metdata").load(xlsxPath).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("not found") && m.contains("Metadata")), e)
  }

  test("multi-file glob maps each workbook's cells by HEADER NAME, not position") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_multi").toString
    // file 1: columns (phs_accession, participant_id, age)
    writeXlsx(s"$dir/a.xlsx", "Metadata",
      Seq("phs_accession", "participant_id", "age", "phs001"), sheetXml)
    // file 2: SAME headers, REVERSED order, plus an extra trailing column
    val reversed =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="s"><v>2</v></c>
        |      <c r="D1" t="s"><v>3</v></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2"><v>44</v></c>
        |      <c r="B2" t="inlineStr"><is><t>p9</t></is></c>
        |      <c r="C2" t="s"><v>4</v></c>
        |      <c r="D2" t="inlineStr"><is><t>junk</t></is></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin
    writeXlsx(s"$dir/b.xlsx", "Metadata",
      Seq("age", "participant_id", "phs_accession", "extra", "phs002"), reversed)
    val df = spark.read.format("xlsx").option("sheet", "Metadata").load(dir)
    assert(df.columns.toSeq == Seq("phs_accession", "participant_id", "age"))
    val rows = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // b.xlsx's reversed columns land under the right names; 'extra' dropped
    assert(rows == Set(
      ("phs001", "p1", "25.0"), ("phs001", null, "31"),
      ("phs002", "p9", "44")), rows.mkString(", "))
  }

  test("duplicate header texts disambiguate pandas-style (ID, ID.1)") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_dup").toString
    val dup =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>0</v></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2"><v>1</v></c>
        |      <c r="B2"><v>2</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin
    writeXlsx(s"$dir/d.xlsx", "Metadata", Seq("ID"), dup)
    val df = spark.read.format("xlsx").option("sheet", "Metadata").load(s"$dir/d.xlsx")
    assert(df.columns.toSeq == Seq("ID", "ID.1"))
    val r = df.collect()(0)
    assert(r.getString(0) == "1" && r.getString(1) == "2")
  }

  test("workbook feeds the pipeline end-to-end (S1 -> v1.3 flow)") {
    val wide = spark.read.format("xlsx").option("sheet", "Metadata").load(xlsxPath)
    val out = Pipeline.run(wide, Seq(
      NodeSpec("participant",
        rawMapping = Seq("participant_id" -> "participant_id", "age" -> "age_at_diagnosis"),
        idProp = "participant_id",
        intProps = Seq("age_at_diagnosis"))))
    val rows = out.nodes("participant")
      .selectExpr("participant_id", "age_at_diagnosis").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // "25.0" integer-coerced to "25" (P6); the id-less row survives as its
    // own record (no id validation configured for it here)
    assert(rows == Set(("p1", "25"), (null, "31")))
  }

  test("XlsxWriter roundtrip: frame out, identical strings back; escapes and nulls survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsx_writer").toString
    val df = Seq(
      ("1", "a & <b> \"q\"", "x\ty"),
      ("2", null, "line1\nline2"),
      ("3", "ünïcode ✓", null),
      ("4", "cr\rcrlf\r\nend", "win\r\nline") // CR must survive as &#xD;
    ).toDF("id", "v1", "v2")
    graft.sources.XlsxWriter.writeWorkbook(df, s"$dir/t.xlsx", "Metadata")
    val back = spark.read.format("xlsx").option("sheet", "Metadata").load(s"$dir/t.xlsx")
    assert(back.columns.toSeq == Seq("id", "v1", "v2"))
    val got = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want, s"roundtrip mismatch: $got")
  }

  test("XlsxWriter multi-sheet workbook: each sheet reads back by name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsx_multi_w").toString
    val meta = Seq(("p1", "female"), ("p2", "male")).toDF("participant_id", "gender")
    val dict = Seq(("gender", "enum")).toDF("property", "kind")
    graft.sources.XlsxWriter.writeWorkbookSheets(
      Seq("Metadata" -> meta, "Dictionary" -> dict), s"$dir/study.xlsx")
    val m = spark.read.format("xlsx").option("sheet", "Metadata").load(s"$dir/study.xlsx")
    assert(m.columns.toSeq == Seq("participant_id", "gender") && m.count() == 2)
    val d = spark.read.format("xlsx").option("sheet", "Dictionary").load(s"$dir/study.xlsx")
    assert(d.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("gender", "enum")))
    // default (no sheet option) = first sheet in declaration order
    val first = spark.read.format("xlsx").load(s"$dir/study.xlsx")
    assert(first.columns.toSeq == Seq("participant_id", "gender"))
  }

  test("XlsxWriter: a 30-column workbook roundtrips (AA+ column refs in anger)") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_wide").toString
    val names = (0 until 30).map(i => s"c$i")
    val row = org.apache.spark.sql.Row.fromSeq((0 until 30).map(i => s"v$i"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row),
      org.apache.spark.sql.types.StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
    graft.sources.XlsxWriter.writeWorkbook(df, s"$dir/wide.xlsx")
    val back = spark.read.format("xlsx").load(s"$dir/wide.xlsx")
    assert(back.columns.toSeq == names)
    assert(back.collect()(0).toSeq == (0 until 30).map(i => s"v$i"))
  }

  test("XlsxWriter emits a conformant OPC package (content types + root rels), atomically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsx_opc").toString
    val path = s"$dir/c.xlsx"
    graft.sources.XlsxWriter.writeWorkbookSheets(
      Seq("Metadata" -> Seq(("1", "a")).toDF("id", "v"),
          "Extra" -> Seq(("2", "b")).toDF("id", "v")), path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      def part(name: String): String = {
        val e = zf.getEntry(name)
        assert(e != null, s"missing package part $name")
        new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
      }
      // root relationship points the package at the workbook part
      assert(part("_rels/.rels").contains("Target=\"xl/workbook.xml\""))
      // content types declare rels/xml defaults + workbook and BOTH sheets
      val ct = part("[Content_Types].xml")
      assert(ct.contains("Extension=\"rels\"") && ct.contains("Extension=\"xml\""))
      assert(ct.contains("PartName=\"/xl/workbook.xml\""))
      assert(ct.contains("PartName=\"/xl/worksheets/sheet1.xml\""))
      assert(ct.contains("PartName=\"/xl/worksheets/sheet2.xml\""))
    } finally zf.close()
    // atomic publish leaves no temp residue beside the workbook
    val residue = new java.io.File(dir).list().toSeq.filterNot(_ == "c.xlsx")
    assert(residue.isEmpty, s"temp residue: $residue")
    // and REPLACES an existing workbook cleanly
    graft.sources.XlsxWriter.writeWorkbook(
      Seq(("9", "z")).toDF("id", "v"), path)
    val back = spark.read.format("xlsx").load(path)
    assert(back.collect().map(_.getString(0)).toSeq == Seq("9"))
  }

  test("XlsxWriter fails loudly on frames beyond the xlsx sheet capacity") {
    val big = spark.range(graft.sources.XlsxWriter.MaxRows.toLong)
      .selectExpr("cast(id as string) as id")
    val dir = java.nio.file.Files.createTempDirectory("xlsx_cap").toString
    val e = intercept[IllegalArgumentException] {
      graft.sources.XlsxWriter.writeWorkbook(big, s"$dir/big.xlsx")
    }
    assert(e.getMessage.contains("sheet capacity"), e.getMessage)
    // the loud failure must leave nothing behind (no truncated workbook)
    assert(new java.io.File(dir).list().isEmpty)
  }

  test("XlsxWriter colRef covers the AA rollover") {
    import graft.sources.XlsxWriter
    assert(XlsxWriter.colRef(0) == "A" && XlsxWriter.colRef(25) == "Z")
    assert(XlsxWriter.colRef(26) == "AA" && XlsxWriter.colRef(27) == "AB")
    assert(XlsxWriter.colRef(51) == "AZ" && XlsxWriter.colRef(52) == "BA")
    assert(XlsxWriter.colRef(701) == "ZZ" && XlsxWriter.colRef(702) == "AAA")
  }

  // --- real-workbook parity: the reference's actual Excel-written files
  // (shared strings, cached-formula `t="str"` cells, numeric cells, row
  // gaps, multiple sheets) — the foreign-xlsx surface the writer's own
  // string-first output never exercises ---

  test("REAL UI-database mappings workbooks read through the native source") {
    val cfg = new java.io.File(sys.env.getOrElse(
      "GRAFT_REFERENCE_DIR", "/root/reference") + "/2-Config-Files/cds_config")
    assume(cfg.isDirectory, "reference checkout not present")
    // (file, Mapping data rows, Must-have data rows)
    val expect = Seq(
      ("UI-database mappings.xlsx", 41L, 19L),
      ("UI-database mappings_v2.xlsx", 86L, 21L),
      ("UI-database mappings_v3.xlsx", 88L, 22L))
    for ((f, nMap, nMust) <- expect) {
      val path = new java.io.File(cfg, f).getAbsolutePath
      val mapping = spark.read.format("xlsx").option("sheet", "Mapping").load(path)
      assert(mapping.columns.length == 6, s"$f Mapping columns")
      assert(mapping.count() == nMap, s"$f Mapping rows")
      val must = spark.read.format("xlsx")
        .option("sheet", "Must have properties").load(path)
      assert(must.count() == nMust, s"$f Must-have rows")
    }
    val v3 = spark.read.format("xlsx").option("sheet", "Mapping")
      .load(new java.io.File(cfg, "UI-database mappings_v3.xlsx").getAbsolutePath)
    assert(v3.columns.toSeq == Seq("Page", "Area", "Display Name", "Full Name",
      "Node Name", "Property Name"))
    // a cached-formula (t="str") cell surfaces its cached value
    import org.apache.spark.sql.functions.col
    val props = v3.select(col("Property Name")).collect().map(_.getString(0)).toSeq
    assert(props.contains("primary_diagnosis"))
  }

  test("foreign-cell hardening: t=\"b\" booleans, cached formulas, absent r attrs") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_foreign").toString
    val path = s"$dir/foreign.xlsx"
    // shapes the in-repo writer never emits: boolean cells, a formula cell
    // carrying a cached <v>, cells WITHOUT r attributes (sequential
    // placement), and a date-styled number (surfaces as its raw serial)
    writeXlsx(path, "Metadata",
      Seq("flag", "total", "when"),
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="s"><v>2</v></c>
        |    </row>
        |    <row r="2">
        |      <c t="b"><v>1</v></c>
        |      <c t="str"><f>SUM(D2:F2)</f><v>42.5</v></c>
        |      <c s="3"><v>44927.25</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3" t="b"><v>0</v></c>
        |      <c r="C3"><f>TODAY()</f><v>45000</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    val df = spark.read.format("xlsx").load(path)
    val rows = df.orderBy("flag").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("FALSE", null, "45000"),   // absent B3; formula C3 -> cached value
      ("TRUE", "42.5", "44927.25")), // no-r cells place sequentially
      "booleans surface as TRUE/FALSE, formulas as cached <v>, " +
        "date-styled numbers as raw serial strings")
  }

  test("""boolean cells accept ECMA-376's "true"/"false" lexical forms""") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_bool").toString
    val path = s"$dir/b.xlsx"
    writeXlsx(path, "Metadata", Seq("a", "b"),
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |    <row r="2"><c r="A2" t="b"><v>true</v></c><c r="B2" t="b"><v>false</v></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    val r = spark.read.format("xlsx").load(path).collect()(0)
    assert((r.getString(0), r.getString(1)) == ("TRUE", "FALSE"))
  }

  // --- date-styled rendering (openpyxl parity, opt-in) ---

  private val dateStyles =
    """<?xml version="1.0"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |  <numFmts count="2">
      |    <numFmt numFmtId="164" formatCode="yyyy&quot;y&quot;"/>
      |    <numFmt numFmtId="165" formatCode="0.00"/>
      |  </numFmts>
      |  <cellXfs count="4">
      |    <xf numFmtId="0"/>
      |    <xf numFmtId="22" applyNumberFormat="1"/>
      |    <xf numFmtId="164" applyNumberFormat="1"/>
      |    <xf numFmtId="165" applyNumberFormat="1"/>
      |  </cellXfs>
      |</styleSheet>""".stripMargin

  private def dateSheet =
    """<?xml version="1.0"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |  <sheetData>
      |    <row r="1">
      |      <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
      |      <c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
      |    </row>
      |    <row r="2">
      |      <c r="A2" s="1"><v>2243016</v></c>
      |      <c r="B2" s="2"><v>45000</v></c>
      |      <c r="C2" s="3"><v>45000</v></c>
      |      <c r="D2" s="1"><v>45000.5209837963</v></c>
      |    </row>
      |  </sheetData>
      |</worksheet>""".stripMargin

  test("renderDates=true renders date-STYLED cells only; default keeps serials") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_dates").toString
    val path = s"$dir/dates.xlsx"
    writeXlsx(path, "Metadata", Seq("d22", "dCustom", "num", "dTime"),
      dateSheet, dateStyles)
    val on = spark.read.format("xlsx").option("renderDates", "true")
      .load(path).collect()(0)
    assert(on.getString(0) == "8041-03-01 00:00:00",
      "builtin numFmt 22 renders (the real clean-dict morphology key)")
    assert(on.getString(1) == "2023-03-15 00:00:00", "custom date formatCode renders")
    assert(on.getString(2) == "45000", "custom NON-date formatCode stays raw")
    assert(on.getString(3) == "2023-03-15 12:30:13",
      "sub-day fraction rounds to whole seconds (openpyxl from_excel)")
    val off = spark.read.format("xlsx").load(path).collect()(0)
    assert(off.getString(0) == "2243016" && off.getString(3) == "45000.5209837963",
      "default surface is the raw serial string")
  }

  test("XlsxDates semantics: Lotus 1900 window, bare times, format detection") {
    import graft.sources.XlsxDates
    // serials below the phantom Feb 29 shift forward one day (Lotus
    // 1900 compensation): 1 -> Jan 1, 59 -> Feb 28, 61 -> Mar 1
    assert(XlsxDates.renderSerial("1").contains("1900-01-01 00:00:00"))
    assert(XlsxDates.renderSerial("59").contains("1900-02-28 00:00:00"))
    assert(XlsxDates.renderSerial("61").contains("1900-03-01 00:00:00"))
    // pure fraction -> bare time-of-day (openpyxl returns datetime.time)
    assert(XlsxDates.renderSerial("0.5").contains("12:00:00"))
    // non-numeric (cached error text) and negatives stay raw
    assert(XlsxDates.renderSerial("#DIV/0!").isEmpty)
    assert(XlsxDates.renderSerial("-1").isEmpty)
    assert(XlsxDates.isDateFormat("yyyy-mm-dd"))
    assert(XlsxDates.isDateFormat("[$-409]d\\-mmm\\-yy"))
    assert(!XlsxDates.isDateFormat("0.00"))
    assert(!XlsxDates.isDateFormat("\"days:\" 0"), "quoted literals are stripped")
    assert(!XlsxDates.isDateFormat("[h]:mm:ss"), "elapsed-hours = timedelta, not date")
  }
}
