package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4/S5/S6 — per-node TSV sink and re-scan (SURVEY.md §2.1).
  *
  * The reference writes one `prefix-node.tsv` per node (tab-separated,
  * header, skipped when the frame is empty — `print_data`,
  * `cds_transformation_functions.py:106-122`) and occasionally reads those
  * TSVs back (`:457`).
  *
  * Scale note: the single-file coalesce exists for *load-format parity*
  * with the reference (the CDS loader wants one TSV per node). At 100 TB
  * you would drop `singleFile=true` and let each node write its natural
  * partition count — the API keeps both paths. Validation-report sinks
  * (S6) are the same writer over a union of report frames.
  */
object Tsv {

  /** S4: write `df` as `dir/name.tsv`. Returns false (skipped) when the
    * frame is empty and `skipIfEmpty` — the reference's all-null guard. */
  def writeNode(
      df: DataFrame, dir: String, name: String,
      singleFile: Boolean = true, skipIfEmpty: Boolean = true): Boolean = {
    if (skipIfEmpty && df.isEmpty) return false
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    if (singleFile) {
      SingleFile.commit(conf, dir, s"$name.tsv") { tmpDir =>
        df.coalesce(1).write.mode("overwrite")
          .option("sep", "\t").option("header", "true")
          .csv(tmpDir)
      }
    } else {
      df.write.mode("overwrite")
        .option("sep", "\t").option("header", "true")
        .csv(new Path(dir, name).toString)
    }
    true
  }

  /** Write every node frame under `dir` with the reference's
    * `prefix-node.tsv` naming; returns the node names actually written. */
  def writeNodes(
      nodes: Map[String, DataFrame], dir: String, prefix: String): Seq[String] =
    nodes.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      if (writeNode(df, dir, s"$prefix-$name")) Some(name) else None
    }

  /** S5: read a TSV back. All columns StringType — the engine's
    * string-first ingestion contract (SURVEY.md §1.2): without
    * `inferSchema`, Spark's CSV reader already types every column as a
    * nullable string, so `1` and `1.0` survive as written (no second
    * schema-building pass needed). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .csv(path)
}
