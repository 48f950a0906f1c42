package graft

import graft.io.Warc

/** WARC format core + the DSv2 `warc` source: roundtrips, multi-member
  * gzip, header folding, and LOUD malformed-record failures. */
class WarcSpec extends SparkSpec {

  private def rec(id: String, text: String) =
    Warc.Record("response", Warc.recordId(id), s"urn:doc:$id",
      "2026-01-01T00:00:00Z", "text/plain", -1L, Map.empty,
      text.getBytes("UTF-8"))

  test("gz roundtrip: one member per record, payloads byte-exact") {
    val dir = java.nio.file.Files.createTempDirectory("warc_rt").toString
    val recs = (1 to 50).map(i => rec(i.toString, s"text $i " + "x" * i))
    Warc.writeGz(s"$dir/a.warc.gz", recs.iterator)
    val in = Warc.open(new java.io.FileInputStream(s"$dir/a.warc.gz"))
    val back = try Warc.records(in, "a").toVector finally in.close()
    assert(back.size == 50)
    back.zip(recs).foreach { case (b, o) =>
      assert(b.warcType == "response" && b.recordId == o.recordId &&
        b.targetUri == o.targetUri &&
        java.util.Arrays.equals(b.payload, o.payload))
      assert(b.contentLength == o.payload.length)
    }
    // gzip members: every record boundary is a fresh member header
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/a.warc.gz"))
    val members = bytes.sliding(2).count(w =>
      (w(0) & 0xFF) == 0x1f && (w(1) & 0xFF) == 0x8b)
    assert(members >= 50, s"expected >= 50 gzip members, found $members")
  }

  test("uncompressed WARC and folded headers parse; unknown headers survive") {
    val raw = new java.io.ByteArrayOutputStream()
    val crlf = "\r\n"
    raw.write((s"WARC/1.0${crlf}WARC-Type: metadata$crlf" +
      s"WARC-Record-ID: <urn:uuid:x>$crlf" +
      s"X-Custom: part one$crlf  and folded$crlf" +
      s"Content-Length: 5$crlf$crlf" + "hello" + crlf + crlf)
      .getBytes("UTF-8"))
    val in = Warc.open(new java.io.ByteArrayInputStream(raw.toByteArray))
    val r = Warc.records(in, "mem").toVector
    assert(r.size == 1 && r.head.warcType == "metadata")
    assert(r.head.headers("X-Custom") == "part one and folded")
    assert(new String(r.head.payload, "UTF-8") == "hello")
  }

  test("malformed records refuse loudly, naming the source") {
    def parse(s: String): Vector[Warc.Record] =
      Warc.records(Warc.open(
        new java.io.ByteArrayInputStream(s.getBytes("UTF-8"))), "bad")
        .toVector
    val crlf = "\r\n"
    // not a WARC version line
    val e1 = intercept[Exception] { parse(s"HTTP/1.1 200 OK$crlf") }
    assert(e1.getMessage.contains("bad") &&
      e1.getMessage.contains("version line"))
    // missing Content-Length
    val e2 = intercept[Exception] {
      parse(s"WARC/1.0${crlf}WARC-Type: response$crlf$crlf")
    }
    assert(e2.getMessage.contains("Content-Length"))
    // truncated payload
    val e3 = intercept[Exception] {
      parse(s"WARC/1.0${crlf}Content-Length: 100$crlf${crlf}short")
    }
    assert(e3.getMessage.contains("truncated"))
  }

  test("DSv2 warc source: per-shard partitions, fixed schema, projection by name") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_ds").toString
    val docs = (1L to 200L).map(i => (i, s"doc $i body")).toDF("id", "txt")
    val shards = Warc.writeShards(docs.repartition(3), "id", "txt", dir)
    assert(shards.size == 3)
    val df = spark.read.format("warc").load(dir)
    assert(df.schema == graft.sources.WarcDataSource.Schema)
    assert(df.rdd.getNumPartitions == 3,
      "one input partition per shard file")
    assert(df.count() == 200)
    // content-lossless roundtrip
    val back = df.select(
      substring(col("target_uri"), 9, 100).cast("long").as("id"),
      decode(col("payload"), "UTF-8").as("txt"))
      .as[(Long, String)].collect().toSet
    assert(back == docs.as[(Long, String)].collect().toSet)
    // header-only projection does not decode payloads into the row
    assert(df.select("warc_type").distinct().as[String].collect()
      .toSeq == Seq("response"))
    assert(df.agg(sum("content_length")).as[Long].collect()(0) ==
      docs.agg(sum(octet_length(col("txt")))).as[Long].collect()(0))
  }
}
