package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus source/sink — the de-facto interchange format for LLM
  * training corpora (one JSON object per line; optionally gzip'd per
  * file). The engine extension beside the reference's TSV surface
  * (SURVEY.md §2.1): same single-file/partitioned duality as [[Tsv]].
  *
  * Scale notes:
  *  - reads ALWAYS take an explicit schema: schema inference is a full
  *    extra pass over 100 TB and silently unions ragged records; with a
  *    schema the read is one pass and extra fields are dropped, missing
  *    ones null (exactly what a corpus contract wants);
  *  - a `.gz` input is decompressed transparently but is NOT splittable —
  *    one task per file; keep shards at a few hundred MB (the standard
  *    corpus layout) so parallelism comes from file count;
  *  - `singleFile` mirrors [[Tsv.writeNode]]'s load-format parity trick
  *    (coalesce + rename) — corpus-scale writes use `singleFile=false`,
  *    one shard per partition.
  */
object Jsonl {

  /** File extension per Hadoop compression codec — the reader resolves
    * the codec FROM the extension, so a misnamed file fails to decode. */
  private val codecExt = Map(
    "gzip" -> "gz", "bzip2" -> "bz2", "zstd" -> "zst",
    "snappy" -> "snappy", "lz4" -> "lz4", "deflate" -> "deflate")

  /** Write `df` as `dir/name.jsonl` (single file) or a sharded dir.
    * `codec` e.g. "gzip" → `.jsonl.gz`. Returns the written path. */
  def write(df: DataFrame, dir: String, name: String,
            singleFile: Boolean = true, codec: Option[String] = None): String = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val ext = "jsonl" + codec.map(c => "." + codecExt.getOrElse(c,
      throw new IllegalArgumentException(
        s"unknown codec '$c' (known: ${codecExt.keys.mkString(", ")})"))).getOrElse("")
    val writer0 = (if (singleFile) df.coalesce(1) else df).write.mode("overwrite")
    val writer = codec.fold(writer0)(c => writer0.option("compression", c))
    if (singleFile) {
      SingleFile.commit(conf, dir, s"$name.$ext")(tmpDir => writer.json(tmpDir)).toString
    } else {
      val out = new Path(dir, name)
      writer.json(out.toString)
      out.toString
    }
  }

  /** Read JSONL under `path` with an explicit schema (never inferred —
    * see the scale notes). `.gz` files decompress transparently. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
