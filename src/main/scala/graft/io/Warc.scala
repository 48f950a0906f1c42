package graft.io

import java.io.{BufferedInputStream, EOFException, InputStream, OutputStream, PushbackInputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC/1.x record format, JDK-only (round-19; the r18 VERDICT's #6):
  * the web crawl's native arrival format — the one source family the
  * LLM-pipeline story was missing (Common Crawl's WET/WARC layout).
  *
  * Format recap (ISO 28500): a record is a version line (`WARC/1.0`),
  * CRLF-terminated named headers (continuation lines fold,
  * RFC-822-style), one blank line, `Content-Length` payload octets,
  * and a two-CRLF trailer. A `.warc.gz` file is a CONCATENATION OF
  * GZIP MEMBERS, customarily one per record, so a reader can seek to
  * member boundaries — `GZIPInputStream` consumes multi-member
  * streams natively, which is what keeps this JDK-only.
  *
  * Malformed input is LOUD: a bad version line, a missing
  * Content-Length, or a truncated payload raises an error naming the
  * source and what was expected — a crawl shard that silently parsed
  * short would poison every count downstream. */
object Warc {

  /** One parsed record: the six first-class headers every pipeline
    * filters on, the full header map for the rest, and the raw
    * payload octets. */
  final case class Record(warcType: String, recordId: String,
                          targetUri: String, date: String,
                          contentType: String, contentLength: Long,
                          headers: Map[String, String],
                          payload: Array[Byte])

  /** CRLF-terminated line (LF tolerated); None at EOF before any byte. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder()
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }

  private def readFully(in: InputStream, n: Long,
                        name: String): Array[Byte] = {
    require(n <= Int.MaxValue, s"$name: payload over 2 GiB unsupported")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < buf.length) {
      val k = in.read(buf, off, buf.length - off)
      if (k < 0) throw new EOFException(
        s"malformed WARC in $name: payload truncated at $off of $n octets")
      off += k
    }
    buf
  }

  /** Iterate the records of one (already-decompressed) WARC stream.
    * The iterator owns the parse position; callers drain it fully or
    * close the underlying stream themselves. */
  def records(in0: InputStream, name: String): Iterator[Record] =
    new Iterator[Record] {
      private val in = in0
      private var nextRec: Option[Record] = advance()

      private def advance(): Option[Record] = {
        // skip inter-record blank lines (the two-CRLF trailer)
        var line = readLine(in)
        while (line.exists(_.isEmpty)) line = readLine(in)
        line match {
          case None => None
          case Some(v) if !v.startsWith("WARC/") =>
            sys.error(s"malformed WARC in $name: expected a WARC/1.x " +
              s"version line, got '${v.take(64)}'")
          case Some(_) =>
            // headers, with RFC-822 continuation folding
            val hdrs = scala.collection.mutable.LinkedHashMap
              .empty[String, String]
            var last: String = null
            var h = readLine(in).getOrElse(sys.error(
              s"malformed WARC in $name: EOF inside record headers"))
            while (h.nonEmpty) {
              if ((h.startsWith(" ") || h.startsWith("\t")) && last != null)
                hdrs(last) = hdrs(last) + " " + h.trim
              else {
                val i = h.indexOf(':')
                require(i > 0, s"malformed WARC in $name: header line " +
                  s"without ':': '${h.take(64)}'")
                last = h.substring(0, i).trim
                hdrs(last) = h.substring(i + 1).trim
              }
              h = readLine(in).getOrElse(sys.error(
                s"malformed WARC in $name: EOF inside record headers"))
            }
            def get(k: String): String =
              hdrs.collectFirst {
                case (n, v) if n.equalsIgnoreCase(k) => v
              }.getOrElse("")
            val len = get("Content-Length")
            require(len.nonEmpty && len.forall(_.isDigit),
              s"malformed WARC in $name: missing/invalid Content-Length " +
                s"('$len')")
            val payload = readFully(in, len.toLong, name)
            Some(Record(get("WARC-Type"), get("WARC-Record-ID"),
              get("WARC-Target-URI"), get("WARC-Date"),
              get("Content-Type"), len.toLong, hdrs.toMap, payload))
        }
      }

      override def hasNext: Boolean = nextRec.isDefined
      override def next(): Record = {
        val r = nextRec.getOrElse(throw new NoSuchElementException)
        nextRec = advance()
        r
      }
    }

  /** Open a WARC stream, sniffing gzip by magic (1f 8b). A gzip file
    * of concatenated members reads as one stream. */
  def open(raw: InputStream): InputStream = {
    val pb = new PushbackInputStream(new BufferedInputStream(raw), 2)
    val b1 = pb.read(); val b2 = pb.read()
    if (b2 >= 0) pb.unread(b2)
    if (b1 >= 0) pb.unread(b1)
    if (b1 == 0x1f && b2 == 0x8b) new GZIPInputStream(pb) else pb
  }

  /** Write one record. `gzipPerRecord` callers wrap `out` per record;
    * this emits the record bytes only. */
  def writeRecord(out: OutputStream, r: Record): Unit = {
    val crlf = "\r\n"
    val sb = new java.lang.StringBuilder()
    sb.append("WARC/1.0").append(crlf)
    def hdr(k: String, v: String): Unit =
      if (v.nonEmpty) { sb.append(k).append(": ").append(v).append(crlf); () }
    hdr("WARC-Type", r.warcType)
    hdr("WARC-Record-ID", r.recordId)
    hdr("WARC-Date", r.date)
    hdr("WARC-Target-URI", r.targetUri)
    hdr("Content-Type", r.contentType)
    sb.append("Content-Length: ").append(r.payload.length).append(crlf)
    r.headers.foreach { case (k, v) =>
      if (!Set("warc-type", "warc-record-id", "warc-date",
          "warc-target-uri", "content-type", "content-length")
          .contains(k.toLowerCase)) hdr(k, v)
    }
    sb.append(crlf)
    out.write(sb.toString.getBytes("UTF-8"))
    out.write(r.payload)
    out.write(s"$crlf$crlf".getBytes("UTF-8"))
  }

  /** Write records as a `.warc.gz` — ONE GZIP MEMBER PER RECORD, the
    * convention that makes crawl archives member-seekable. */
  def writeGz(path: String, recs: Iterator[Record]): Long = {
    val fos = new java.io.FileOutputStream(path)
    var n = 0L
    try recs.foreach { r =>
      val gz = new GZIPOutputStream(fos)
      writeRecord(gz, r)
      gz.finish() // member boundary; keep fos open for the next one
      n += 1
    } finally fos.close()
    n
  }

  /** Deterministic record id for synthesized corpora. */
  def recordId(key: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"<urn:uuid:${d.substring(0, 8)}-${d.substring(8, 12)}-" +
      s"${d.substring(12, 16)}-${d.substring(16, 20)}-${d.substring(20)}>"
  }

  /** Shard a (id, text) frame into `.warc.gz` files, ONE PER
    * PARTITION, each written BY ITS EXECUTOR — the crawl-shard shape
    * (at 100 TB every task streams its own shard; nothing funnels
    * through the driver). Returns the shard paths. `outDir` must be
    * visible to the executors (local[?] or shared FS — the test rig's
    * shape; object stores take the same loop over their own client). */
  def writeShards(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, outDir: String): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val spark = docs.sparkSession
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    docs.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .rdd.mapPartitionsWithIndex { (i, iter) =>
        val path = f"$outDir/shard-$i%05d.warc.gz"
        val recs = iter.map { case (id, text) =>
          Record("response", recordId(id), s"urn:doc:$id",
            "2026-01-01T00:00:00Z", "text/plain", -1L, Map.empty,
            Option(text).getOrElse("").getBytes("UTF-8"))
        }
        val n = writeGz(path, recs)
        if (n > 0) Iterator(path)
        else { new java.io.File(path).delete(); Iterator.empty }
      }.collect().toSeq.sorted
  }
}
