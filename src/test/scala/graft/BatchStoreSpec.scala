package graft

import java.nio.file.Files
import graft.io.BatchStore

/** S7/S8: the reference's `{transformed,raw}/{batch}/{timestamp}/` bucket
  * layout, spec-asserted on `file://` (same Hadoop FS code path as s3a). */
class BatchStoreSpec extends SparkSpec {

  private def touch(dir: java.nio.file.Path, name: String, body: String = "x"): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(name), body)
  }

  test("uploadBatch lays out transformed tsv and raw xlsx under timestamped prefixes") {
    val root = Files.createTempDirectory("graft_batch")
    val out = root.resolve("output"); val data = root.resolve("data")
    val bucket = root.resolve("bucket")
    touch(out.resolve("b1"), "cds-study.tsv", "id\n1")
    touch(out.resolve("b1"), "cds-file.tsv", "id\n2")
    touch(out.resolve("b1"), "notes.txt")                  // filtered out
    touch(data.resolve("b1"), "workbook.xlsx", "bin")
    touch(data.resolve("b1"), "readme.md")                 // filtered out

    val conf = spark.sparkContext.hadoopConfiguration
    val (t, r) = BatchStore.uploadBatch(
      conf, out.toString, data.toString, "b1", "20260812-103000",
      s"file://$bucket")

    assert(t.endsWith("/transformed/b1/20260812-103000"))
    assert(r.endsWith("/raw/b1/20260812-103000"))
    // drop Hadoop LocalFileSystem's .crc sidecars — a file:// test artifact
    // (object stores have no checksum shadow files)
    def ls(p: java.nio.file.Path) =
      p.toFile.list().filterNot(_.startsWith(".")).sorted.toSeq
    assert(ls(bucket.resolve("transformed/b1/20260812-103000")) ==
      Seq("cds-file.tsv", "cds-study.tsv"))
    assert(ls(bucket.resolve("raw/b1/20260812-103000")) == Seq("workbook.xlsx"))
    // content survives the round trip
    assert(Files.readString(
      bucket.resolve("transformed/b1/20260812-103000/cds-study.tsv")) == "id\n1")
  }

  test("downloadBatch mirrors only workbooks from the raw prefix into the data folder") {
    val root = Files.createTempDirectory("graft_batch_dl")
    val bucket = root.resolve("bucket")
    touch(bucket.resolve("raw/b2/ts1"), "a.xlsx", "A")
    touch(bucket.resolve("raw/b2/ts1"), "b.xlsx", "B")
    touch(bucket.resolve("raw/b2/ts1"), "junk.tsv")
    val data = root.resolve("data")

    val got = BatchStore.downloadBatch(
      spark.sparkContext.hadoopConfiguration,
      s"file://$bucket", "raw/b2/ts1", data.toString, "b2")

    assert(got.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("a.xlsx", "b.xlsx"))
    assert(data.resolve("b2").toFile.list().filterNot(_.startsWith("."))
      .sorted.toSeq == Seq("a.xlsx", "b.xlsx"))
    assert(Files.readString(data.resolve("b2/a.xlsx")) == "A")
    // absent prefix is a no-op, not an error
    assert(BatchStore.downloadBatch(
      spark.sparkContext.hadoopConfiguration,
      s"file://$bucket", "raw/missing", data.toString, "b3").isEmpty)
  }
}
