package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Reshape
import graft.pipeline.Primordial
import graft.pipeline.Primordial.AddProp

/** v1 (primordial) orchestration e2e on a fixture shaped like the
  * reference's workbooks (`cds-transformation.py`): 7 row sheets + the
  * transposed Study sheet, the hardcoded add-properties table, diagnosis/
  * participant removal with participant re-extracted from its own sheet,
  * and the study column-drop + dedup epilogue. */
class PrimordialSpec extends SparkSpec {
  import spark.implicits._

  private def idx(df: DataFrame, by: String): DataFrame =
    df.withColumn("__row",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(by)))
        .cast("long"))

  private lazy val manifest = idx(Seq(
    ("g1", "open", "s1", "f1.bam", 11L, "lib1"),
    ("g2", "open", "s2", "f2.bam", 22L, "lib2"),
    ("g3", "controlled", "s1", "f3.bam", 33L, "lib3"))
    .toDF("GUID", "acl", "sample_id", "File Name", "File Size", "library_id"), "GUID")

  // explicit __row: sheet order, NOT sorted — positional alignment with
  // the Sample sheet is what the reference's concat branch relies on
  private lazy val explorer = Seq(
    ("s1", "p1", 1L), ("s2", "p2", 2L), ("s1", "p1", 3L))
    .toDF("Sample ID", "Participant ID", "__row")

  private lazy val fileSheet = idx(Seq(
    ("f1.bam", 11L, "abc"), ("f2.bam", 22L, "def"), ("f3.bam", 33L, "ghi"))
    .toDF("file_name", "file_size", "md5sum"), "file_name")

  private lazy val genomic = idx(Seq(
    ("lib1", 100L), ("lib2", 200L), ("lib3", 300L))
    .toDF("library_id", "bases"), "library_id")

  private lazy val participantSheet = idx(Seq(
    ("p1", "female"), ("p2", "male"))
    .toDF("participant_id", "gender"), "participant_id")

  private lazy val sampleSheet = idx(Seq(
    ("s1", "tumor"), ("s2", "normal"))
    .toDF("sample_id", "sample_type"), "sample_id")

  // Study arrives as a transposed key/value sheet (S3) and is replicated
  // to the manifest's row count, reference :108-121
  private lazy val studySheet = {
    val kv = Seq(
      ("phs_accession", "phs001"), ("study_name", "Demo"),
      ("acl", "['phs001']"), ("size_of_data_being_uploaded", "1TB"),
      ("study_external_url", "http://x")).toDF("k", "v")
    val wide = Reshape.transposedKv(kv, "k", "v",
      Seq("phs_accession", "study_name", "acl",
        "size_of_data_being_uploaded", "study_external_url"))
    Primordial.scalarSheet(wide, manifest, "__row")
  }

  private lazy val model = Seq(
    "file" -> Seq("file_name", "file_size", "md5sum"),
    "genomic_info" -> Seq("library_id", "bases"),
    "sample" -> Seq("sample_type"),
    "participant" -> Seq("participant_id", "gender"),
    "diagnosis" -> Seq("diagnosis_id"),
    "study" -> Seq("phs_accession", "study_name",
      "size_of_data_being_uploaded", "study_external_url"))

  private lazy val nodes = Primordial.run(
    sheets = Seq(
      "File" -> fileSheet, "Genomic_Info" -> genomic,
      "CDS_Manifest" -> manifest, "CGC_CDS_Explorer" -> explorer,
      "SRA_Run_Selector" -> idx(Seq(("r1")).toDF("Run"), "Run"),
      "Study" -> studySheet, "Sample" -> sampleSheet),
    model = model,
    extraSheets = Map("Participant" -> participantSheet))

  test("file node: fuzzy extract + manifest add_properties (acl, GUID, parent pointer)") {
    val f = nodes("file")
    assert(f.columns.toSet == Set(
      "file_name", "file_size", "md5sum", "type", "acl", "file_id", "sample.sample_id"))
    val r = f.filter(col("file_name") === "f1.bam").collect()
    // join key is file_name (shared property) so add_properties joined,
    // not concatenated — row f1.bam carries ITS manifest GUID
    assert(r.length == 1 && r(0).getAs[String]("file_id") == "g1"
      && r(0).getAs[String]("acl") == "open"
      && r(0).getAs[String]("sample.sample_id") == "s1")
    assert(f.select("type").distinct().collect().map(_.getString(0)).toSeq == Seq("file"))
  }

  test("participant comes ONLY from the Participant sheet (removed then re-extracted)") {
    val p = nodes("participant")
    assert(p.count() == 2)
    assert(p.columns.toSet == Set("participant_id", "gender", "type", "study.phs_accession"))
    // add_properties concat branch: phs pointer replicated from Study_df
    assert(p.select(ColNames.q("study.phs_accession")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("phs001"))
  }

  test("diagnosis node is removed outright") {
    assert(!nodes.contains("diagnosis"))
  }

  test("study: scalar replication collapses to one row after drops + dedup") {
    val s = nodes("study")
    assert(s.count() == 1)
    val cols = s.columns.toSet
    assert(!cols.contains("size_of_data_being_uploaded") && !cols.contains("study_external_url"))
    val r = s.collect()(0)
    assert(r.getAs[String]("phs_accession") == "phs001"
      && r.getAs[String]("data_access_level") == "['phs001']")
  }

  test("sample: explorer ids attach by row position (no shared property)") {
    val sm = nodes("sample")
    assert(sm.count() == 2)
    val r = sm.filter(col("sample_id") === "s2").collect()
    // row 2 of the Sample sheet (normal) aligns with explorer row 2 (s2,p2)
    assert(r.length == 1 && r(0).getAs[String]("sample_type") == "normal"
      && r(0).getAs[String]("participant.participant_id") == "p2")
  }

  test("add_properties dedup ignores the row index and keeps the first occurrence") {
    // two data-identical file rows at different ordinals: pandas
    // drop_duplicates (index-blind, keep='first') collapses them to one
    val dupFiles = Seq(
      ("f1.bam", 11L, "abc", 1L), ("f1.bam", 11L, "abc", 2L), ("f2.bam", 22L, "def", 3L))
      .toDF("file_name", "file_size", "md5sum", "__row")
    val m = Seq(("g1", "open", "s1", "f1.bam", 11L, "lib1"), ("g2", "open", "s2", "f2.bam", 22L, "lib2"))
      .toDF("GUID", "acl", "sample_id", "File Name", "File Size", "library_id")
      .withColumn("__row", col("File Size") / 11)
    val out = Primordial.run(
      sheets = Seq("CDS_Manifest" -> m, "File" -> dupFiles),
      model = Seq("file" -> Seq("file_name", "file_size", "md5sum")),
      addProps = Seq(
        // file_name is shared with the node frame -> the JOIN branch (the
        // only one the reference dedups after) multiplies then collapses
        AddProp("file", "file_name", "File Name", "CDS_Manifest"),
        AddProp("file", "file_id", "GUID", "CDS_Manifest")))("file")
    assert(out.filter(col("file_name") === "f1.bam").count() == 1)
  }

  test("add_properties join aborts on column overlap beyond the key, like pandas") {
    // node frame already carries file_id; the add-props new_df shares BOTH
    // acl (join key candidate: no) — construct: first shared prop is
    // file_name, and new_df also carries md5sum which the frame has
    val files = Seq(("f1.bam", "abc", 1L)).toDF("file_name", "md5sum", "__row")
    val m = Seq(("f1.bam", "XYZ", "open", 1L))
      .toDF("fname", "sum2", "acl", "__row")
    val ex = intercept[IllegalArgumentException] {
      Primordial.run(
        sheets = Seq("File" -> files, "CDS_Manifest" -> m),
        model = Seq("file" -> Seq("file_name", "md5sum")),
        addProps = Seq(
          AddProp("file", "file_name", "fname", "CDS_Manifest"),
          AddProp("file", "md5sum", "sum2", "CDS_Manifest")))
    }
    assert(ex.getMessage.contains("overlap"))
  }

  test("configFromV1Yaml parses the REAL v1 config's file/sheet wiring verbatim") {
    val refDir = sys.env.getOrElse("GRAFT_REFERENCE_DIR", "/root/reference")
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(refDir)))
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(refDir,
        "2-Config-Files/cds_config/cds_config_example.yaml")),
      java.nio.charset.StandardCharsets.UTF_8)
    val cfg = Primordial.configFromV1Yaml(yaml)
    assert(cfg.nodeFile == "./node_file/cds-model.yml")
    assert(cfg.dataFile1 == "./cds_raw_data_files/data1.xlsx")
    assert(cfg.dataFile2 == "./cds_raw_data_files/data2.xlsx")
    assert(cfg.outputFolder == "./cds_node_data_files/")
    // the script's hard-coded sheet ownership (cds-transformation.py:80-112)
    assert(cfg.sheetFile("CDS Manifest") == cfg.dataFile1)
    assert(cfg.sheetFile("SRA Run Selector") == cfg.dataFile1)
    assert(cfg.sheetFile("Participant") == cfg.dataFile2)
    assert(cfg.sheetFile("Study") == cfg.dataFile2)
    // missing keys fail loudly by name
    val ex = intercept[RuntimeException] {
      Primordial.configFromV1Yaml("NODE_FILE: ./m.yml\n")
    }
    assert(ex.getMessage.contains("DATA_FILE1"))
  }
}
