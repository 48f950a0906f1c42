package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cascade, Combine, Dedup, Ids, Normalize}
import graft.mapping.RawDict
import graft.state.History
import graft.validate.Validations

/** Per-operator unit specs over tiny in-memory frames, pinning the
  * reference's semantic quirks (SURVEY.md §2 / §7.4). */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------- Dedup A1

  test("A1 stringified dedup distinguishes 1 vs 1.0 as strings and handles nulls") {
    val df = Seq(
      (Some("1"), Some("a")), (Some("1"), Some("a")),
      (Some("1.0"), Some("a")),
      (None, Some("a")), (Some("a"), None)).toDF("x", "y")
    val out = Dedup.stringified(df)
    assert(out.count() == 4)
  }

  test("A1 subset-key dedup keeps a deterministic row (min full-row rendering)") {
    val df = Seq(("k1", "z"), ("k1", "a"), ("k2", "m")).toDF("k", "v")
    val out = Dedup.stringified(df, Seq("k")).orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("k1", "a"), ("k2", "m")))
  }

  test("P7 dropAllNullRows drops only rows null in every subset column") {
    val df = Seq(
      (1, Some("a"), None: Option[String]),
      (2, None: Option[String], None: Option[String]),
      (3, None: Option[String], Some("b"))).toDF("id", "p1", "p2")
    val out = Dedup.dropAllNullRows(df, Seq("p1", "p2"))
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(1, 3))
  }

  // ----------------------------------------------------------- Combine A2

  test("A2 fold: distinct-sort-join with substring suppression and trim") {
    val df = Seq(
      ("k", " b "), ("k", "ab"), ("k", "b"), ("k", "c"),
      ("k2", "only"),
      ("k3", null)).toDF("id", "v")
    val out = Combine.combineRows(df, "id", Seq("v")).orderBy("id").collect()
    // k: trimmed distinct sorted = [ab, b, c]; "b" is substring of "ab" -> skipped
    assert(out(0).getString(1) == "ab, c")
    assert(out(1).getString(1) == "only")
    assert(out(2).isNullAt(1))
  }

  test("J7 combineColumns formats integral floats integer-style") {
    val df = Seq((25.0, 3.5, "x")).toDF("a", "b", "c")
    val out = df.select(
      Combine.combineColumns(Seq(col("a"), col("b"), col("c"))).as("id")).collect()
    assert(out(0).getString(0) == "25_3.5_x")
  }

  // --------------------------------------------------------- Normalize P*

  test("P3/P4 blank->null and trim over string columns only") {
    val df = Seq((" x ", "  ", 5)).toDF("a", "b", "n")
    val out = Normalize.blanksToNull(Normalize.trimAll(df)).collect()(0)
    assert(out.getString(0) == "x")
    assert(out.isNullAt(1))
    assert(out.getInt(2) == 5)
  }

  test("P5 cleanValues: enum passthrough, mapping, mapping-to-null, fallthrough") {
    val df = Seq("Alive", "alive", "8041-03-01 00:00:00", "weird").toDF("v")
    val cleaned = df.select(Normalize.cleanValues(
      col("v"),
      Map("alive" -> Some("Alive"), "8041-03-01 00:00:00" -> None),
      enumValues = Seq("Alive", "Dead")).as("c"))
    val got = cleaned.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("Alive", "Alive", null, "weird"))
  }

  test("P5 cleanValues: nan_value fill, extra-long sink, enum beats mapping") {
    val longV = "L" * 60
    val mapping = Map("alive" -> Some("Alive"),
      // precedence probe: 'Alive' is in the enum, so this must never fire
      "Alive" -> Some("WRONG"))
    val df = Seq(Option("alive"), Option("Alive"), None, Option(longV), Option("other"))
      .toDF("v")
    val got = df.select(Normalize.cleanValues(col("v"), mapping,
        enumValues = Seq("Alive", "Dead"),
        nanValue = Some("Unknown"),
        extraLongValues = Seq(longV)).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("Alive", "Alive", "Unknown", Normalize.NotSpecified, "other"))
  }

  test("P5 cleanValues: nan/extra-long default off — prior behavior unchanged") {
    val df = Seq(Option("alive"), None).toDF("v")
    val got = df.select(Normalize.cleanValues(col("v"),
        Map("alive" -> Some("Alive"))).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("Alive", null))
  }

  test("P5 enumCleanable: lone TBD / 'not reported' exempt, real vocab cleans") {
    import Normalize.enumCleanable
    assert(!enumCleanable(Nil), "no enum -> not cleaned (reference loop shape)")
    assert(!enumCleanable(Seq("TBD")))
    assert(!enumCleanable(Seq("not reported")))
    assert(enumCleanable(Seq("TBD", "Alive")), "multi-value vocab cleans even with TBD first")
    assert(enumCleanable(Seq("Alive")))
  }

  test("P6 losslessInt: integral doubles reformatted, others verbatim") {
    val df = Seq("25.0", "25.5", "abc", "1e3", "-0.0").toDF("v")
    val got = df.select(Normalize.losslessInt(col("v")).as("c")).as[String].collect().toSeq
    assert(got == Seq("25", "25.5", "abc", "1000", "0"))
  }

  test("P11 unitsToBytes: GB/TB/PB parsed, junk and unknown units -> null") {
    val df = Seq("1.5 TB", "2 GB", "800PB", "12 zz", "junk", " 3  GB ").toDF("v")
    val got = df.select(Normalize.unitsToBytes(col("v")).as("b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(Some(1500000000000L), Some(2000000000L),
      Some(800000000000000000L), None, None, Some(3000000000L)))
  }

  test("P16 parseTimestampMulti: first accepting format wins, junk -> null") {
    val df = Seq(
      "2024-03-15 10:00:00",  // ISO
      "03/15/2024 10:00:00",  // US
      "15.03.2024 10:00:00",  // EU
      "01/02/2024 00:00:00",  // ambiguous digits — US listed first wins
      "not a date").toDF("v")
    val out = df.select(Normalize.parseTimestampMulti(col("v"),
        Seq("yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy HH:mm:ss",
          "dd.MM.yyyy HH:mm:ss")).cast("string").as("p"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(
      Some("2024-03-15 10:00:00"), Some("2024-03-15 10:00:00"),
      Some("2024-03-15 10:00:00"), Some("2024-01-02 00:00:00"), None))
  }

  // ----------------------------------------------------------------- Ids

  test("P10 deterministicId is stable and null-token-safe") {
    val df = Seq((Some("a"), Some("b")), (None, Some("ab")), (Some("a"), Some("b")))
      .toDF("x", "y")
    val ids = df.select(Ids.deterministicId(Seq(col("x"), col("y"))).as("id"))
      .as[String].collect()
    assert(ids(0) == ids(2))
    assert(ids(0) != ids(1))
  }

  // ------------------------------------------------------------- Cascade

  test("J8 cascade: child of deleted parent dies; multi-parent survives until all null") {
    val parent = Seq((1, "dead"), (2, "alive")).toDF("pid", "status")
    val child = Seq((10, Some(1), Some(2)), (11, Some(1), None), (12, Some(2), None))
      .toDF("cid", "fk_a", "fk_b")
    // both fk_a and fk_b point at parent
    val out = Cascade.delete(
      nodes = Map("parent" -> parent, "child" -> child),
      parents = Map("child" -> Seq(
        Cascade.ParentRef("fk_a", "parent", "pid"),
        Cascade.ParentRef("fk_b", "parent", "pid"))),
      ids = Map("parent" -> "pid", "child" -> "cid"),
      seeds = Map("parent" -> parent.filter(col("status") === "dead").select(col("pid"))))
    val survivors = out("child").select("cid").as[Int].collect().sorted.toSeq
    // 10 survives (fk_b=2 alive), 11 dies (all pointers null), 12 survives
    assert(survivors == Seq(10, 12))
    assert(out("parent").select("pid").as[Int].collect().toSeq == Seq(2))
  }

  test("J8 seed deletion is null-safe: a null-id offender row is removed") {
    val node = Seq((Some(1), "a"), (None, "x"), (None, "y"), (Some(2), "b"))
      .toDF("id", "v")
    val seeds = Seq(Option.empty[Int]).toDF("id") // the null-id group
    val out = Cascade.delete(
      nodes = Map("n" -> node), parents = Map.empty,
      ids = Map("n" -> "id"), seeds = Map("n" -> seeds))
    val left = out("n").select("v").as[String].collect().sorted.toSeq
    // both null-id rows die (plain left_anti would keep them: null != null)
    assert(left == Seq("a", "b"))
  }

  // ------------------------------------------------------------- RawDict

  test("P2 Ratcliff-Obershelp ratio matches difflib reference values") {
    assert(RawDict.ratio("abcd", "bcde") == 0.75)
    assert(RawDict.ratio("", "") == 1.0)
    assert(RawDict.ratio("abc", "abc") == 1.0)
    assert(RawDict.ratio("abc", "xyz") == 0.0)
    // difflib.SequenceMatcher(None, 'study id', 'study_id').ratio() == 0.875
    assert(RawDict.ratio("study id", "study_id") == 0.875)
  }

  test("§3.2 inferDict bootstraps a per-node raw dict from a schema") {
    val dict = RawDict.inferDict(
      Seq("Study ID", "Sample Type", "Unmappable Col"),
      Map(
        "study" -> Seq("study_id", "study_name"),
        "sample" -> Seq("sample_type", "sample_id")))
    assert(dict("study") == Seq("Study ID" -> "study_id"))
    assert(dict("sample") == Seq("Sample Type" -> "sample_type"))
  }

  test("P2 fuzzyMatch applies normalization and the 0.75 threshold") {
    val m = RawDict.fuzzyMatch(
      Seq("Study ID", "Completely Unrelated"),
      Seq("study_id", "sample_id"))
    assert(m == Map("Study ID" -> "study_id"))
  }

  test("P1 extract keeps live mapped columns, tags node, guards empty mapping") {
    val df = Seq(("a", Option.empty[String], "c")).toDF("raw1", "raw2", "raw3")
    val out = RawDict.extract(df,
      Seq("raw1" -> "p1", "raw2" -> "p2", "missing" -> "p3"), node = "n")
    assert(out.columns.toSeq == Seq("p1", "type")) // raw2 all-null pruned
    val empty = RawDict.extract(df, Seq("missing" -> "p"), node = "n")
    assert(empty.columns.toSeq == Seq("type") && empty.count() == 0)
  }

  test("P1 first-match rule: first LIVE raw candidate per property wins") {
    // (candidates differ by more than case — Spark resolves column names
    // case-insensitively, so GUID/guid would be ambiguous in one frame)
    val df = Seq((Option.empty[String], "g2", "x"))
      .toDF("GUID", "guid_alt", "other")
    // GUID maps first but is all-null -> guid_alt supplies file_id
    val out = RawDict.extract(df,
      Seq("GUID" -> "file_id", "guid_alt" -> "file_id"), node = "file")
    assert(out.columns.toSeq == Seq("file_id", "type"))
    assert(out.collect()(0).getString(0) == "g2")
    // both live -> dict order wins
    val df2 = Seq(("g1", "g2")).toDF("GUID", "guid_alt")
    val out2 = RawDict.extract(df2,
      Seq("GUID" -> "file_id", "guid_alt" -> "file_id"), node = "file")
    assert(out2.collect()(0).getString(0) == "g1")
  }

  // ------------------------------------------------------------- History

  test("H1/H2 merge unions values, sorts desc, applyHistory renders joined") {
    val state = Seq(("s1", Seq("v2", "v1"))).toDF("key", "values")
    val updates = Seq(("s1", Seq("v3", "v1")), ("s2", Seq("x"))).toDF("key", "values")
    val merged = History.merge(state, updates).orderBy("key").collect()
    assert(merged(0).getSeq[String](1) == Seq("v3", "v2", "v1"))
    assert(merged(1).getSeq[String](1) == Seq("x"))
    val node = Seq(("s1", "old")).toDF("key", "versions")
    val rendered = History.applyHistory(node, "key", "versions",
      History.merge(state, updates)).collect()
    assert(rendered(0).getString(1) == "v3,v2,v1")
  }

  test("H1 strict ingestion aborts on a null historical value (ref :423-425)") {
    val ok = Seq(("s1", "v1, v2"), ("s2", "v3")).toDF("key", "vals")
    assert(History.updatesFromColumn(ok, "key", "vals")
      .orderBy("key").collect()(0).getSeq[String](1) == Seq("v1", "v2"))
    val withNull = Seq(("s1", "v1"), ("s2", null)).toDF("key", "vals")
    val e = intercept[Exception] {
      History.updatesFromColumn(withNull, "key", "vals").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("historical value is null")), e.getMessage)
    // opt-out keeps the lenient pre-guard behavior (null -> null values)
    val lenient = History.updatesFromColumn(withNull, "key", "vals", strict = false)
      .orderBy("key").collect()
    assert(lenient(1).isNullAt(1))
  }

  // ---------------------------------------------------------- Validations

  test("A3/A4 duplicate ids and conflict columns") {
    val df = Seq((1, "a", "x"), (1, "b", "x"), (2, "c", "y")).toDF("id", "p", "q")
    val dups = Validations.duplicateIds(df, "id").collect()
    assert(dups.length == 1 && dups(0).getInt(0) == 1)
    val conf = Validations.conflictColumns(df, "id", Seq("p", "q")).collect()
    assert(conf.length == 1 && conf(0).getString(2) == "p")
  }

  test("A12 k-anonymity/l-diversity: small groups and homogeneous groups flag") {
    // (zip, age) quasi keys; diagnosis sensitive. Group (1,30): 3 rows,
    // 3 distinct -> k fails (k=4), l passes (l=2). Group (2,40): 4 rows
    // but ONE diagnosis -> k passes, l fails (homogeneity). Group (3,50):
    // 4 rows, 2 distinct -> both pass. NULL sensitive values don't count
    // toward diversity.
    val df = Seq(
      (1, 30, "flu"), (1, 30, "cold"), (1, 30, "ok"),
      (2, 40, "flu"), (2, 40, "flu"), (2, 40, "flu"), (2, 40, "flu"),
      (3, 50, "a"), (3, 50, "a"), (3, 50, "b"), (3, 50, null))
      .toDF("zip", "age", "diag")
    val out = Validations.kAnonymity(df, Seq("zip", "age"), "diag", k = 4, l = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out((1, 30)) == ((3L, 3L, 0L, 1L)))
    assert(out((2, 40)) == ((4L, 1L, 1L, 0L)))
    assert(out((3, 50)) == ((4L, 2L, 1L, 1L))) // null diag excluded from l_div
  }

  test("A5 orphans: all parent pointers null") {
    val df = Seq((1, Some("a"), None: Option[String]), (2, None: Option[String], None: Option[String]))
      .toDF("id", "f1", "f2")
    assert(Validations.orphans(df, Seq("f1", "f2")).select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("V4 ssnScan finds reference patterns incl. lookaround form") {
    val df = Seq("call 123-45-6789 now", "id 123_45_6789", "x123456789x", "clean")
      .toDF("file_name")
    val out = Validations.ssnScan(df, "file_name").collect()
    assert(out.length == 3)
  }

  test("V3 uiFill injects absent columns and fills nulls") {
    val df = Seq((1, Some("v")), (2, None: Option[String])).toDF("id", "present")
    val out = Validations.uiFill(df, Seq("present", "absent"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "v")
    assert(rows(1).getString(1) == Validations.NotSpecified)
    assert(rows(0).getString(2) == Validations.NotSpecified)
  }

  // ----------------------------------------------------------- Profile V10

  test("profile counts rows/nulls/distincts and renders typed min/max") {
    val df = Seq(
      (Some(3L), Some("b"), Some(2.5)),
      (Some(1L), None, Some(10.25)),
      (Some(3L), Some("a"), None))
      .toDF("k", "s", "x")
    val out = graft.ops.Profile.profile(df,
        render = Map("x" -> ((c: org.apache.spark.sql.Column) =>
          format_string("%.2f", c))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("k") == (3L, 0L, 2L, "1", "3"))
    assert(out("s") == (3L, 1L, 2L, "a", "b"))
    // typed min/max: 2.5 < 10.25 numerically (string order would flip it)
    assert(out("x") == (3L, 1L, 2L, "2.50", "10.25"))
  }

  test("drift flags null spikes, category growth, and range shifts in one pass") {
    // old batch: ids 1-3, cat {a,b}, no nulls; new: ids 4-6, cat {a,b,c},
    // one null, max id shifts -> max_same=0 for id, min_same=1 for cat
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("a")),
      (4L, Some("a")), (5L, None), (6L, Some("c")))
      .toDF("id", "cat")
    val out = graft.ops.Profile.drift(df, isNew = col("id") >= 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert((id.getLong(1), id.getLong(2)) == (3L, 3L))     // n_old, n_new
    assert((id.getLong(3), id.getLong(4)) == (0L, 0L))     // no id nulls
    assert((id.getLong(5), id.getLong(6)) == (3L, 3L))     // distincts
    assert((id.getInt(7), id.getInt(8)) == (0, 0))         // 1-3 vs 4-6
    val cat = out("cat")
    assert((cat.getLong(3), cat.getLong(4)) == (0L, 1L))   // null spike
    assert((cat.getLong(5), cat.getLong(6)) == (2L, 2L))   // {a,b} vs {a,c}
    assert((cat.getInt(7), cat.getInt(8)) == (1, 0))       // min a=a, max b!=c
  }

  test("drift with an all-null side keeps flags false, not null") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "v")
    val out = graft.ops.Profile.drift(df, isNew = col("id") === 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert((out("v").getInt(7), out("v").getInt(8)) == (0, 0))
    assert(out("v").getLong(3) == 1L && out("v").getLong(4) == 0L)
  }

  test("profile approx tier estimates distincts without Expand") {
    val df = (1 to 1000).map(i => (i.toLong, i % 10)).toDF("id", "m")
    val approx = graft.ops.Profile.profile(df, exactDistinct = false)
    val rows = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL++ at default rsd is exact-ish at this cardinality
    assert(math.abs(rows("id") - 1000L) <= 30L && math.abs(rows("m") - 10L) <= 1L)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must not plan an Expand")
    // the exact tier DOES expand — the disclosed multi-distinct cost
    val exact = graft.ops.Profile.profile(df)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("histogram: exact integer bucketing, edges land low, null/empty safe") {
    // range 0..19 into 4 buckets of 5: boundary values 5,10,15 must land
    // in the HIGHER bucket's base (exact div — no float floor drift)
    val df = ((0L to 19L).map(Option(_)) :+ Option.empty[Long]).toDF("v")
    val out = graft.ops.Profile.histogram(df, "v", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      0L -> (5L, 0L, 4L), 1L -> (5L, 5L, 9L),
      2L -> (5L, 10L, 14L), 3L -> (5L, 15L, 19L)), s"got $out")
    // constant column: everything in bucket 0
    val const = Seq(7L, 7L, 7L).toDF("v")
    val c = graft.ops.Profile.histogram(const, "v", 8).collect()
    assert(c.length == 1 && c(0).getLong(0) == 0L && c(0).getLong(1) == 3L)
    // all-null / empty input: empty result, not a degenerate bucket
    assert(graft.ops.Profile.histogram(
      Seq(Option.empty[Long]).toDF("v"), "v", 4).count() == 0L)
  }

  test("uiMissingReport: absent props reported, present-but-null props are not") {
    import graft.validate.Validations
    import spark.implicits._
    val d = Seq((1L, null: String)).toDF("id", "source")
    val r = Validations.uiMissingReport(d, "document",
      Seq("source", "license", "source_filled"), "f.xlsx")
    assert(r.columns.toSeq ==
      Seq("missing_property", "ui_related", "raw_data_file"))
    assert(r.collect().map(x => (x.getString(0), x.getBoolean(1), x.getString(2)))
      .toSeq == Seq(
        ("document.license", true, "f.xlsx"),
        ("document.source_filled", true, "f.xlsx")),
      "source is PRESENT (though all-null) - filled by uiFill, never reported")
    // after the fill, a re-run reports nothing (fill + report compose)
    val filled = Validations.uiFill(d, Seq("source", "license", "source_filled"))
    assert(Validations.uiMissingReport(filled, "document",
      Seq("source", "license", "source_filled"), "f.xlsx").isEmpty)
  }

  test("V3 exemption: exempted prop is reported but never filled nor injected") {
    import graft.validate.Validations
    import spark.implicits._
    val ex = "experimental_strategy_and_data_subtypes"
    // ABSENT branch (cds_transformation_functions.py:322-325): column must
    // NOT be injected while non-exempt absent props are
    val d = Seq((1L, null: String), (2L, "GRCh38")).toDF("file_id", "reference_genome_assembly")
    val filled = Validations.uiFill(d, Seq("reference_genome_assembly", "file_type", ex))
    assert(filled.columns.contains("file_type"), "non-exempt absent prop injected")
    assert(!filled.columns.contains(ex), "exempted prop must not be injected")
    // ... but the report leg still fires for it (:326-329)
    val rep = Validations.uiMissingReport(d, "file",
      Seq("reference_genome_assembly", "file_type", ex), "b.xlsx")
    assert(rep.select("missing_property").as[String].collect().toSet ==
      Set("file.file_type", s"file.$ex"))
    // PRESENT-with-nulls branch (:333-335): na.fill must skip the exemption
    val d2 = Seq((1L, null: String, null: String), (2L, "wgs", "bam"))
      .toDF("file_id", ex, "file_type")
    val f2 = Validations.uiFill(d2, Seq(ex, "file_type")).orderBy("file_id").collect()
    assert(f2(0).getString(1) == null, "exempted prop's nulls must survive the fill")
    assert(f2(0).getString(2) == Validations.NotSpecified)
  }

  test("V3 exemption against the REAL v3 UI-mapping workbook") {
    import graft.validate.Validations
    import spark.implicits._
    val wb = new java.io.File(sys.env.getOrElse(
      "GRAFT_REFERENCE_DIR", "/root/reference") +
      "/2-Config-Files/cds_config/UI-database mappings_v3.xlsx")
    assume(wb.isFile, "reference checkout not present")
    val mapping = spark.read.format("xlsx").option("sheet", "Mapping")
      .load(wb.getAbsolutePath)
    val required = Validations.uiRequiredFromMapping(mapping, "file")
    val ex = "experimental_strategy_and_data_subtypes"
    assert(required.contains(ex),
      "the real Mapping sheet lists the exempted prop under node `file`")
    // a file frame missing the exempted prop: reported, never injected —
    // the reference's emitted file TSV deliberately lacks this column
    val d = Seq((1L, "f1.bam")).toDF("file_id", "file_name")
    val out = Validations.uiFill(d, required)
    assert(!out.columns.contains(ex))
    assert((required.toSet -- out.columns.toSet) == Set(ex),
      "every other UI-required prop is injected")
    assert(Validations.uiMissingReport(d, "file", required, "b.xlsx")
      .select("missing_property").as[String].collect().contains(s"file.$ex"))
  }

  test("check suite: one-pass metrics — completeness bp, dup counts, set/bounds violations, vacuous regex") {
    import graft.validate.Checks
    import graft.validate.Checks._
    val d = Seq(
      (1L, Some("a"), Some("X"), Some(5L), Some("12-345")),
      (2L, None, Some("X"), Some(-3L), Some("99-999")),
      (3L, Some("c"), Some("Y"), Some(20L), None),
      (4L, Some("d"), Some("Z"), None, Some("bad")))
      .toDF("id", "name", "cat", "v", "ph")
    val rep = Checks.run(d, Seq(
      Complete("name", 7000L),
      Complete("name", 8000L),
      Unique("id"),
      Unique("cat"),
      InSet("cat", Seq("X", "Y")),
      Bounds("v", 0L, 10L),
      Matches("ph", "^[0-9]{2}-[0-9]{3}$", 6000L),
      Matches("name", "^zzz$", 1L)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rep(0) == (("complete", "name", 7500L, 7000L, 1L)))
    assert(rep(1) == (("complete", "name", 7500L, 8000L, 0L)))
    assert(rep(2) == (("unique", "id", 0L, 0L, 1L)))
    // cat: X twice -> one duplicate row beyond the first
    assert(rep(3) == (("unique", "cat", 1L, 0L, 0L)))
    assert(rep(4) == (("in_set", "cat", 1L, 0L, 0L)))
    // v: -3 and 20 out of [0,10]; the null is not a violation
    assert(rep(5) == (("bounds", "v", 2L, 0L, 0L)))
    // ph: 2 of 3 non-null match -> 6666 bp >= 6000
    assert(rep(6) == (("matches", "ph", 6666L, 6000L, 1L)))
    // zero matches among non-nulls -> 0 bp, fails even a 1 bp floor
    assert(rep(7) == (("matches", "name", 0L, 1L, 0L)))
    // vacuous regex on an all-null column passes at the 10000 ceiling
    val vac = Checks.run(d.withColumn("allnull", lit(null).cast("string")),
      Seq(Matches("allnull", "x", 10000L))).collect()(0)
    assert(vac.getLong(2) == 10000L && vac.getLong(4) == 1L)
    // report row order is the declaration order (explode of a literal
    // array), so positional asserts above are stable by construction
  }
}
