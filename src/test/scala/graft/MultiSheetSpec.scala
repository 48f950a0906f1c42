package graft

import org.apache.spark.sql.functions._
import graft.pipeline.MultiSheet

/** v1.2 multi-sheet wiring semantics (SURVEY.md §3.3). */
class MultiSheetSpec extends SparkSpec {

  import spark.implicits._

  test("J3 lookup keeps the column only when every row matches (all-or-nothing)") {
    val sample = Seq(("s1", "T"), ("s2", "N")).toDF("sample_id", "t")
    val fps = Seq(
      ("s1", "p9", 2), ("s1", "p1", 1), // first match by order -> p1
      ("s2", "p2", 1)).toDF("sample_id", "participant_id", "ord")
    val wired = MultiSheet.lookupFirstMatch(
      sample, "sample_id", fps, "participant_id", "ord", "participant_id")
    assert(wired.columns.contains("participant_id"))
    assert(wired.orderBy("sample_id").collect().map(_.getString(2)).toSeq == Seq("p1", "p2"))

    // one sample with no mapping row -> whole column dropped
    val sample2 = sample.union(Seq(("s3", "T")).toDF("sample_id", "t"))
    val wired2 = MultiSheet.lookupFirstMatch(
      sample2, "sample_id", fps, "participant_id", "ord", "participant_id")
    assert(!wired2.columns.contains("participant_id"))
  }

  test("J4 broadcast scalar only fires for exactly one non-null parent row") {
    val child = Seq(1, 2).toDF("x")
    val oneRow = Seq("phs001").toDF("phs_accession")
    val got = MultiSheet.broadcastScalar(child, oneRow, "phs_accession", "study.phs_accession")
    assert(got.select("`study.phs_accession`").as[String].collect().toSeq ==
      Seq("phs001", "phs001"))
    val twoRows = Seq("phs001", "phs002").toDF("phs_accession")
    assert(!MultiSheet.broadcastScalar(child, twoRows, "phs_accession", "out")
      .columns.contains("out"))
  }

  test("P10 ensureId fills only missing ids, deterministically") {
    val file = Seq((Some("f1"), "a.bam"), (None, "b.bam"))
      .toDF("file_id", "file_name")
    val out = MultiSheet.ensureId(file, "file_id", Seq("file_name"))
      .orderBy("file_name").collect()
    assert(out(0).getString(0) == "f1")
    assert(out(1).getString(0).matches("[0-9a-f]{64}"))
    // deterministic across invocations
    val again = MultiSheet.ensureId(file, "file_id", Seq("file_name"))
      .orderBy("file_name").collect()
    assert(out(1).getString(0) == again(1).getString(0))
  }

  // --- transform: the v1.2 end-to-end orchestration
  //     (cds-transformation_v1.2.py:133-196) ---

  private def sheets7(
      fps: org.apache.spark.sql.DataFrame,
      study: org.apache.spark.sql.DataFrame) = Map(
    "Study" -> study,
    "Participant" -> Seq(("P1", "m", ""), ("P2", "f", " "))
      .toDF("Participant ID", "Gender", "Ethnicity"),
    "Sample" -> Seq(("s1", "T"), ("s2", "N")).toDF("Sample ID", "Sample Type"),
    "File" -> Seq(("a.bam", "g1"), ("b.bam", "g2")).toDF("File Name", "guid"),
    "Genomic Info" -> Seq(("L1", "O")).toDF("Library ID", "Library Strategy"),
    "Diagnosis (opt)" -> Seq(("D1", "x", "P1"))
      .toDF("Diagnosis ID", "Primary Diagnosis", "participant_id"),
    "File-Participant-Sample Mapping" -> fps)

  private val specs7 = Seq(
    MultiSheet.SheetSpec("study", "Study",
      Map("PHS Accession" -> "phs_accession")),
    MultiSheet.SheetSpec("participant", "Participant", Map(
      "Participant ID" -> "participant_id", "Gender" -> "gender",
      "Ethnicity" -> "ethnicity")),
    MultiSheet.SheetSpec("sample", "Sample", Map(
      "Sample ID" -> "sample_id", "Sample Type" -> "sample_type")),
    MultiSheet.SheetSpec("file", "File", Map("File Name" -> "file_name")),
    MultiSheet.SheetSpec("genomic_info", "Genomic Info", Map(
      "Library ID" -> "library_id", "Library Strategy" -> "library_strategy")),
    MultiSheet.SheetSpec("diagnosis", "Diagnosis (opt)", Map(
      "Diagnosis ID" -> "diagnosis_id",
      "Primary Diagnosis" -> "primary_diagnosis")))

  test("transform wires all v1.2 stages: fallback, pointers, J4, J3, clean") {
    val fps = Seq(("g1", "s1", "P1", 1L), ("g2", "s2", "P2", 2L))
      .toDF("file_id", "sample_id", "participant_id", "row_order")
    val study = Seq("phs001").toDF("PHS Accession")
    val nodes = MultiSheet.transform(sheets7(fps, study), specs7,
      MultiSheet.CleanSpec(
        enums = Map("library_strategy" -> Seq("WGS", "WXS")),
        cleanDict = Map("library_strategy" -> Map("O" -> Some("WGS")))))
    // all-blank Ethnicity column skipped by the liveness probe
    assert(!nodes("participant").columns.contains("ethnicity"))
    // J4: single-row study broadcast onto participant
    assert(nodes("participant").select(col("`study.phs_accession`"))
      .as[String].collect().toSet == Set("phs001"))
    // file_id fallback found the guid column, same-row
    assert(nodes("file").orderBy("file_name").select("file_id")
      .as[String].collect().toSeq == Seq("g1", "g2"))
    // diagnosis parent pointer from the raw sheet column
    assert(nodes("diagnosis").select(col("`participant.participant_id`"))
      .as[String].collect().toSeq == Seq("P1"))
    // J3 legs both attached
    assert(nodes("sample").orderBy("sample_id")
      .select(col("`participant.participant_id`"))
      .as[String].collect().toSeq == Seq("P1", "P2"))
    assert(nodes("file").orderBy("file_id").select(col("`sample.sample_id`"))
      .as[String].collect().toSeq == Seq("s1", "s2"))
    // P5 clean fired on the genomic_info enum prop
    assert(nodes("genomic_info").select("library_strategy")
      .as[String].collect().toSeq == Seq("WGS"))
    // type discriminator everywhere
    assert(nodes.values.forall(_.columns.contains("type")))
  }

  test("transform: the file leg is gated on the SAMPLE leg's completeness") {
    // s2 has no mapping row -> sample leg incomplete -> BOTH legs' columns
    // absent (the reference's :194 gating reads the sample loop's list)
    val fps = Seq(("g1", "s1", "P1", 1L))
      .toDF("file_id", "sample_id", "participant_id", "row_order")
    val study = Seq("phs001").toDF("PHS Accession")
    val nodes = MultiSheet.transform(sheets7(fps, study), specs7)
    assert(!nodes("sample").columns.contains("participant.participant_id"))
    assert(!nodes("file").columns.contains("sample.sample_id"),
      "file leg must not keep its column when the sample leg was incomplete")
  }

  test("transform: a null in a gating fps column disables that leg") {
    // null participant_id -> gate A fails -> sample untouched; and with
    // the sample leg never run, the file leg is skipped too
    val fps = Seq(("g1", "s1", Option.empty[String], 1L), ("g2", "s2", Some("P2"), 2L))
      .toDF("file_id", "sample_id", "participant_id", "row_order")
    val study = Seq("phs001").toDF("PHS Accession")
    val nodes = MultiSheet.transform(sheets7(fps, study), specs7)
    assert(!nodes("sample").columns.contains("participant.participant_id"))
    assert(!nodes("file").columns.contains("sample.sample_id"))
  }

  test("transform: multi-row study never broadcasts") {
    val fps = Seq(("g1", "s1", "P1", 1L), ("g2", "s2", "P2", 2L))
      .toDF("file_id", "sample_id", "participant_id", "row_order")
    val study = Seq("phs001", "phs002").toDF("PHS Accession")
    val nodes = MultiSheet.transform(sheets7(fps, study), specs7)
    assert(!nodes("participant").columns.contains("study.phs_accession"))
  }

  test("specsFromV12Yaml parses the REAL v1.2 config + its pointed-to artifacts verbatim") {
    val refDir = sys.env.getOrElse("GRAFT_REFERENCE_DIR", "/root/reference")
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(refDir)))
    def slurpAbs(rel: String): String = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(refDir, rel.stripPrefix("./"))),
      java.nio.charset.StandardCharsets.UTF_8)
    val (specs, clean, cfg) = MultiSheet.specsFromV12Yaml(
      slurpAbs("2-Config-Files/cds_config_v1.2/cds_config_example_v1.2.yaml"),
      slurpAbs)
    // the flat config's own keys
    assert(cfg("DATA_BATCH_NAME") == "cds_data_2022-11-17")
    assert(cfg("RATIO_LIMIT") == "0.75")
    assert(cfg("RAW_DATA_DICTIONARY")
      .endsWith("cds_config_v1.2/cds_raw_dict_v1.2.yaml"))
    // one SheetSpec per raw-dict node, bound to the script's literal
    // sheet names
    val byNode = specs.map(s => s.node -> s).toMap
    assert(byNode.keySet ==
      Set("diagnosis", "file", "genomic_info", "participant", "sample", "study"))
    assert(byNode("diagnosis").sheet == "Diagnosis (opt)")
    assert(byNode("genomic_info").sheet == "Genomic Info")
    // identity mappings plus the dict's REAL renames
    assert(byNode("participant").mapping("gender") == "gender")
    assert(byNode("study").mapping("number_of_participant")
      == "number_of_participants")
    assert(byNode("study").mapping("experimental_strategy_and_data_subtype")
      == "experimental_strategy_and_data_subtypes")
    // clean wiring from MODEL_FILE_PROPS + CLEAN_DICT
    assert(clean.enums("gender").contains("Unspecified"))
    assert(clean.cleanDict("gender")("MALE").contains("male"))
    assert(clean.cleanDict("sample_type")("Invalid value").isEmpty) // map-to-NULL
    assert(clean.intProps.contains("file_size")
      && clean.intProps.contains("age_at_diagnosis"))
    assert(!clean.intProps.contains("number_of_participants"),
      "Type 'number' must not integer-coerce")
    // a missing required key fails loudly by name
    val ex = intercept[RuntimeException] {
      MultiSheet.specsFromV12Yaml("DATA_FOLDER: ./x\n", slurpAbs)
    }
    assert(ex.getMessage.contains("RAW_DATA_DICTIONARY"))
  }
}
