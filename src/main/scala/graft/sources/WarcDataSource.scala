package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** S49 — WARC as a DataSource V2 connector (round-19; the r18
  * VERDICT's #6): `spark.read.format("warc").load(path)` over
  * `.warc` / `.warc.gz` crawl shards, the pretraining corpus's native
  * arrival format. Parsing is [[graft.io.Warc]] — JDK-only, loud on
  * malformed records.
  *
  * Scale shape: ONE INPUT PARTITION PER FILE. Gzip'd WARC is not
  * byte-range splittable (members are the seek unit, and member
  * indexes are external metadata), but a crawl is thousands of
  * ~1 GB shards — file-granularity parallelism IS the natural split,
  * exactly as Common Crawl consumers run it. Fixed schema, so no
  * inference pass touches the data:
  *
  *   warc_type, record_id, target_uri, warc_date, content_type
  *   (strings), content_length (long), payload (binary).
  *
  * Filters/projections on the header columns stay cheap (headers are
  * a few hundred bytes per record); downstream text operators decode
  * `payload` with the engine's own kernels. */
class WarcDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = true

  private def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("warc source requires a path"))
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val stat = fs.globStatus(p)
    def isWarc(n: String): Boolean = {
      val l = n.toLowerCase
      l.endsWith(".warc") || l.endsWith(".warc.gz") || l.endsWith(".gz")
    }
    if (stat == null || stat.isEmpty) Seq.empty
    else stat.toSeq.flatMap { s =>
      if (s.isDirectory)
        fs.listStatus(s.getPath).toSeq
          .filter(f => f.isFile && isWarc(f.getPath.getName))
          .map(_.getPath.toString)
      else Seq(s.getPath.toString)
    }.sorted
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new WarcTable(schema, listFiles(options), options)
  }
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType)))
}

final class WarcTable(
    schema: StructType, files: Seq[String], options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = s"warc(${options.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val conf = new SerializableConfiguration(
          SparkSession.active.sparkContext.hadoopConfiguration)
        files.map(f => WarcPartition(f, schema, conf): InputPartition)
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition): PartitionReader[InternalRow] =
            new WarcReader(p.asInstanceOf[WarcPartition])
        }
    }
}

final case class WarcPartition(file: String, schema: StructType,
                               conf: SerializableConfiguration)
  extends InputPartition

final class WarcReader(p: WarcPartition)
    extends PartitionReader[InternalRow] {
  private val path = new Path(p.file)
  private val stream = graft.io.Warc.open(
    path.getFileSystem(p.conf.value).open(path))
  private val recs = graft.io.Warc.records(stream, p.file)
  // project once: schema field -> record accessor index
  private val idx = p.schema.fieldNames.map(n =>
    WarcDataSource.Schema.fieldNames.indexOf(n)).toArray
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!recs.hasNext) false
    else {
      val r = recs.next()
      def s(v: String): Any =
        if (v == null || v.isEmpty) null else UTF8String.fromString(v)
      val full: Array[Any] = Array(s(r.warcType), s(r.recordId),
        s(r.targetUri), s(r.date), s(r.contentType),
        r.contentLength, r.payload)
      current = InternalRow.fromSeq(
        idx.toIndexedSeq.map(i => if (i >= 0) full(i) else null))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
