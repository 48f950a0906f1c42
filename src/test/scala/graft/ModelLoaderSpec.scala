package graft

import org.apache.spark.sql.types._
import graft.model.ModelLoader

/** S9: YAML model/config parsing — fixtures mirror the reference's
  * artifact SHAPES (cds-model.yml:3-345, cds-model-props.yml,
  * cds_raw_dict_v1.3.yaml, cds_clean_dict_v1.3.yaml) with synthetic
  * content. */
class ModelLoaderSpec extends SparkSpec {

  private val modelYaml =
    """Nodes:
      |  study:
      |    Props:
      |      - phs_accession
      |      - study_name
      |  file:
      |    Props:
      |      - file_id
      |      - file_size
      |      - avg_read_length
      |Relationships:
      |  of_study:
      |    Mul: many_to_one
      |    Ends:
      |      - Src: file
      |        Dst: study
      |  from_sample:
      |    Mul: many_to_many
      |    Ends:
      |      - Src: file
      |        Dst: sample
      |""".stripMargin

  private val propsYaml =
    """PropDefinitions:
      |  phs_accession:
      |    Type: ^phs[0-9]+([.]v[0-9]+)*$
      |    Req: true
      |    Key: true
      |  study_name:
      |    Type: string
      |  file_id:
      |    Type: string
      |    Key: true
      |  file_size:
      |    Type: integer
      |  avg_read_length:
      |    Type: number
      |  data_types:
      |    Type:
      |      value_type: list
      |      item_type: string
      |  vital_status:
      |    Enum:
      |      - Alive
      |      - Dead
      |""".stripMargin

  test("model parse: nodes, relationships, cardinality") {
    val m = ModelLoader.parseModel(modelYaml, propsYaml)
    assert(m.nodes.map(_.name) == Seq("file", "study"))
    assert(m.parentsOf("file").map(r => (r.name, r.dst, r.mul)).toSet ==
      Set(("of_study", "study", "many_to_one"), ("from_sample", "sample", "many_to_many")))
  }

  test("prop defs: model types map to Spark types (§1.2)") {
    val p = ModelLoader.parsePropDefs(propsYaml)
    assert(p("file_size").spark == LongType)
    assert(p("avg_read_length").spark == DoubleType)
    assert(p("data_types").spark == ArrayType(StringType) && p("data_types").isList)
    assert(p("phs_accession").pattern.get.startsWith("^phs"))
    assert(p("phs_accession").required && p("phs_accession").key)
    assert(p("vital_status").enum == Seq("Alive", "Dead"))
  }

  test("derived node schema is model-typed and nullable") {
    val m = ModelLoader.parseModel(modelYaml, propsYaml)
    val s = m.schemaOf("file")
    assert(s == StructType(Seq(
      StructField("file_id", StringType, true),
      StructField("file_size", LongType, true),
      StructField("avg_read_length", DoubleType, true))))
  }

  test("raw dict preserves first-match order; clean dict maps to Option") {
    val raw = ModelLoader.parseRawDict(
      """file:
        |  GUID: file_id
        |  guid: file_id
        |  file_format: file_type
        |""".stripMargin)
    assert(raw("file").head == ("GUID" -> "file_id")) // first mapped wins
    val clean = ModelLoader.parseCleanDict(
      """gender:
        |  female: Female
        |  unknown:
        |""".stripMargin)
    assert(clean("gender")("female").contains("Female"))
    assert(clean("gender")("unknown").isEmpty) // maps to null
  }

  test("raw-dict YAML round trip: emit -> parseRawDict -> identical mapping, order kept") {
    import graft.mapping.RawDict
    // headers with YAML-hostile content: colon+space, quotes, unicode,
    // leading dash — snakeyaml must quote them so the reload is identical
    val dict = Map(
      "participant" -> Seq(
        "Participant: ID" -> "participant_id",
        "\"Gender\"" -> "gender",
        "âge étude" -> "age_at_diagnosis"),
      "file" -> Seq(
        "- GUID -" -> "file_id",
        "guid" -> "file_id", // two candidates, order is the P1 contract
        "File Size" -> "file_size"))
    val back = ModelLoader.parseRawDict(RawDict.renderRawDictYaml(dict))
    assert(back == dict, s"round trip mutated the dict: $back")
    // nodeOrder pins emission order for curated-diff stability
    val y = RawDict.renderRawDictYaml(dict, nodeOrder = Seq("participant", "file"))
    assert(y.indexOf("participant:") < y.indexOf("file:"))
    // bootstrap path: inferDict output round-trips too
    val inferred = RawDict.inferDict(
      Seq("Participant ID", "Gender", "File Size", "GUID"),
      Map("participant" -> Seq("participant_id", "gender"),
        "file" -> Seq("file_id", "file_size")))
    assert(ModelLoader.parseRawDict(RawDict.renderRawDictYaml(inferred)) == inferred)
    assert(inferred("participant") ==
      Seq("Participant ID" -> "participant_id", "Gender" -> "gender"))
    assert(inferred("file") == Seq("File Size" -> "file_size"),
      "GUID must stay sub-threshold (curated-dict territory, not bootstrap)")
  }

  test("parseCleanDictFull: nan_value and extra_long_values split out of the mappings") {
    val cd = ModelLoader.parseCleanDictFull(
      """gender:
        |  female: Female
        |  nan_value: Unknown
        |vital_status:
        |  dead: Dead
        |extra_long_values:
        |  - "some very long protocol description"
        |""".stripMargin)
    assert(cd.mappings("gender") == Map("female" -> Some("Female")),
      "nan_value must not leak into the dirty->clean map")
    assert(cd.nanValues == Map("gender" -> "Unknown"))
    assert(cd.mappings("vital_status")("dead").contains("Dead"))
    assert(!cd.mappings.contains("extra_long_values"))
    assert(cd.extraLongValues == Seq("some very long protocol description"))
    // the narrow parse stays backward-compatible
    assert(ModelLoader.parseCleanDict("""g:
      |  a: B
      |""".stripMargin) == Map("g" -> Map("a" -> Some("B"))))
    // a bare key (null value) is an empty list, not an NPE
    assert(ModelLoader.parseCleanDictFull("""g:
      |  a: B
      |extra_long_values:
      |""".stripMargin).extraLongValues.isEmpty)
  }

  // --- real-artifact parity: the ACTUAL reference files (s14/s15) ---

  private val refDir = sys.env.getOrElse("GRAFT_REFERENCE_DIR", "/root/reference")
  private def refFile(rel: String) = new java.io.File(s"$refDir/$rel")
  private def slurpRef(rel: String): String =
    new String(java.nio.file.Files.readAllBytes(refFile(rel).toPath), "UTF-8")

  test("REAL cds-model.yml + cds-model-props.yml: inventory and model-typed schema") {
    assume(refFile("3-Model-Files/cds-model.yml").isFile, "reference checkout not present")
    val m = ModelLoader.parseModel(
      slurpRef("3-Model-Files/cds-model.yml"),
      slurpRef("3-Model-Files/cds-model-props.yml"))
    assert(m.nodes.map(_.name) == Seq("diagnosis", "file", "genomic_info", "image",
      "participant", "program", "sample", "study", "treatment"))
    assert(m.nodes.map(_.props.size).sum == 221)
    assert(m.relationships.size == 8, "5 named relationships, 8 Src/Dst ends")
    assert(m.propDefs.size == 215)
    assert(m.propDefs.valuesIterator.count(_.enum.nonEmpty) == 53)
    assert(m.propDefs.valuesIterator.count(_.required) == 64,
      "Req true/'Yes' are required; 'Preferred'/'No'/false are not")
    assert(m.propDefs.valuesIterator.count(_.key) == 10)
    assert(m.propDefs.valuesIterator.count(_.isList) == 3)
    val fs = m.schemaOf("file")
    assert(fs.size == 10)
    assert(fs("file_size").dataType == LongType)
    assert(fs.fields.count(_.dataType == LongType) == 1)
    assert(m.propDefs("md5sum").pattern.contains("^[0-9a-fA-F]{32}$"))
  }

  test("REAL v1.3 raw+clean dict pair: mapping inventory and dated-version drift") {
    assume(refFile("2-Config-Files/cds_config_v1.3/cds_raw_dict_v1.3.yaml").isFile,
      "reference checkout not present")
    val raw = ModelLoader.parseRawDict(
      slurpRef("2-Config-Files/cds_config_v1.3/cds_raw_dict_v1.3.yaml"))
    assert(raw.size == 9)
    assert(raw.valuesIterator.map(_.size).sum == 118)
    val clean = ModelLoader.parseCleanDictFull(
      slurpRef("2-Config-Files/cds_config_v1.3/cds_clean_dict_v1.3.yaml"))
    assert(clean.mappings.size == 29)
    assert(clean.mappings.valuesIterator.map(_.size).sum == 1203)
    assert(clean.extraLongValues.size == 1)
    val a = ModelLoader.parseRawDict(
      slurpRef("2-Config-Files/cds_config_v1.3/cds_raw_dict_v1.3_2023_Jan.yaml"))
    val b = ModelLoader.parseRawDict(
      slurpRef("2-Config-Files/cds_config_v1.3/cds_raw_dict_v1.3_2024_Mar.yaml"))
    val d = graft.mapping.RawDict.drift(a, b)
    assert(d.find(_.node == "image").contains(
      graft.mapping.RawDict.DictDrift("image", "added", 30, 0, 0)),
      "image arrives wholesale in the Mar-2024 dict")
    assert(d.find(_.node == "study").contains(
      graft.mapping.RawDict.DictDrift("study", "kept", 15, 3, 0)))
    assert(d.map(_.added).sum == 70 && d.map(_.removed).sum == 21 &&
      d.map(_.retargeted).sum == 0)
  }

  test("RawDict.drift: added/removed/retargeted counts and node status") {
    import graft.mapping.RawDict
    val old = Map("n" -> Seq("A" -> "p1", "B" -> "p2"), "gone" -> Seq("X" -> "q"))
    val neu = Map("n" -> Seq("A" -> "p9", "C" -> "p3"), "fresh" -> Seq("Y" -> "r"))
    assert(RawDict.drift(old, neu) == Seq(
      RawDict.DictDrift("fresh", "added", 1, 0, 0),
      RawDict.DictDrift("gone", "removed", 0, 1, 0),
      RawDict.DictDrift("n", "kept", 1, 1, 1)),
      "A retarget (A: p1->p9) is neither an add nor a remove")
  }

  test("RawDict.drift rejects duplicate raw headers instead of undercounting") {
    import graft.mapping.RawDict
    val dup = Map("n" -> Seq("A" -> "p1", "A" -> "p2"))
    val clean = Map("n" -> Seq("A" -> "p1"))
    val e = intercept[IllegalArgumentException] { RawDict.drift(dup, clean) }
    assert(e.getMessage.contains("repeats raw header") && e.getMessage.contains("A"))
    val e2 = intercept[IllegalArgumentException] { RawDict.drift(clean, dup) }
    assert(e2.getMessage.contains("new dict"))
  }
}
