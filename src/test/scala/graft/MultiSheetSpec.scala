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
}
