package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** S1 — native Excel source as a DataSource V2 connector
  * (`spark.read.format("xlsx").option("sheet", "Metadata").load(path)`).
  *
  * The reference ingests submitter workbooks with
  * `pd.read_excel(..., keep_default_na=False)`
  * (cds-transformation_v1.3.py:129-132); this connector reproduces that
  * string-first contract natively in Spark: every cell surfaces as a
  * STRING exactly as serialized (no NA coercion, no type inference), one
  * all-StringType column per header cell.
  *
  * Scale shape: one input partition per workbook file — a batch of
  * per-study workbooks (S2's glob) scans in parallel across the cluster,
  * which is exactly the reference's unit of independent work. Workbooks
  * are single-digit-MB documents, so file-granularity parallelism is the
  * right split; no intra-file splitting is attempted (xlsx is a zip —
  * not byte-range splittable).
  *
  * Options: `sheet` (worksheet name; default: first sheet),
  * `header` (default true: first row names the columns),
  * `renderDates` (default false: date-styled numeric cells surface as
  * raw serial strings; true = the openpyxl/pandas rendering the
  * reference observes — see [[XlsxDates]]).
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "xlsx"
  override def supportsExternalMetadata(): Boolean = true

  private def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("xlsx source requires a path"))
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val stat = fs.globStatus(p)
    if (stat == null || stat.isEmpty) Seq.empty
    else stat.toSeq.flatMap { s =>
      if (s.isDirectory)
        fs.listStatus(s.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.toLowerCase.endsWith(".xlsx"))
          .map(_.getPath.toString)
      else Seq(s.getPath.toString)
    }.sorted
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = listFiles(options)
    require(files.nonEmpty, s"no xlsx files at ${options.get("path")}")
    val sheet = Option(options.get("sheet")).getOrElse("")
    val header = Option(options.get("header")).forall(_.toBoolean)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val first = new Path(files.head)
    val fs = first.getFileSystem(conf)
    val renderDates = Option(options.get("renderDates")).exists(_.toBoolean)
    val rows = XlsxParser.readSheet(() => fs.open(first), sheet, renderDates)
    require(rows.nonEmpty, s"empty worksheet in ${files.head}")
    val names =
      if (header) XlsxHeaders.names(rows.head)
      else rows.head.indices.map(i => s"_c$i")
    StructType(names.map(n => StructField(n, StringType, nullable = true)))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new XlsxTable(schema, listFiles(options), options)
  }
}

final class XlsxTable(
    schema: StructType, files: Seq[String], options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = s"xlsx(${options.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val sheet = Option(options.get("sheet")).getOrElse("")
        val header = Option(options.get("header")).forall(_.toBoolean)
        val renderDates = Option(options.get("renderDates")).exists(_.toBoolean)
        val conf = new SerializableConfiguration(
          SparkSession.active.sparkContext.hadoopConfiguration)
        files.map(f =>
          XlsxPartition(f, sheet, header, renderDates, schema, conf): InputPartition).toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
            new XlsxReader(partition.asInstanceOf[XlsxPartition])
        }
    }
}

final case class XlsxPartition(
    file: String, sheet: String, header: Boolean, renderDates: Boolean,
    schema: StructType, conf: SerializableConfiguration) extends InputPartition

/** Header-row naming shared by schema inference and every per-file reader:
  * blank cells become `_cN`, duplicate header texts are disambiguated
  * pandas-style (`ID`, `ID.1`, `ID.2`) — a StructType with duplicate
  * field names would make every downstream by-name reference ambiguous. */
object XlsxHeaders {
  def names(row: IndexedSeq[String]): IndexedSeq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    row.zipWithIndex.map { case (v, i) =>
      val base = Option(v).filter(_.nonEmpty).getOrElse(s"_c$i")
      seen.get(base) match {
        case None => seen(base) = 0; base
        case Some(k) => seen(base) = k + 1; s"$base.${k + 1}"
      }
    }
  }
}

final class XlsxReader(p: XlsxPartition) extends PartitionReader[InternalRow] {
  // Each workbook maps its cells to the schema BY HEADER NAME, not by
  // position: per-study files may order columns differently or add extras
  // (pd.read_excel semantics). Fields absent in this file read as null;
  // this file's extra columns are ignored. Headerless mode stays
  // positional by construction.
  private val (rows, fieldIdx) = {
    val path = new Path(p.file)
    val fs = path.getFileSystem(p.conf.value)
    val all = XlsxParser.readSheet(() => fs.open(path), p.sheet, p.renderDates)
    if (p.header) {
      val hdr = if (all.nonEmpty) XlsxHeaders.names(all.head) else IndexedSeq.empty
      (all.drop(1).iterator, p.schema.fieldNames.map(hdr.indexOf).toArray)
    } else (all.iterator, p.schema.fieldNames.indices.toArray)
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      val cells = rows.next()
      val width = p.schema.length
      val vals = new Array[Any](width)
      var i = 0
      while (i < width) {
        val j = fieldIdx(i)
        val v = if (j >= 0 && j < cells.length) cells(j) else null
        vals(i) = if (v == null) null else UTF8String.fromString(v)
        i += 1
      }
      current = InternalRow.fromSeq(vals.toIndexedSeq)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
