package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run/cross-batch exact-dedup state: a parquet table of content
  * keys already seen (fingerprints, content hashes, natural ids). The
  * incremental twin of the batch hash-groupBy dedup — each batch keeps
  * only never-seen rows (`left_anti` against the state), then the state
  * absorbs the batch's keys.
  *
  * Scale posture:
  *  - the state table carries ONE narrow column; at 10¹¹ documents that
  *    is still orders of magnitude smaller than the corpus, and the
  *    anti-join shuffles only (batch keys ∪ matching state partitions);
  *  - writes go to a versioned subdirectory then swap a pointer file —
  *    single-writer discipline with readable-while-writing semantics
  *    (the reference's whole-file YAML rewrite, made atomic; SURVEY.md
  *    §7.4 risk 5);
  *  - for latency-critical paths the same contract can move to a
  *    streaming `dropDuplicates` + watermark state store; this parquet
  *    form is replayable and engine-restart-proof.
  */
object SeenKeys {

  private def pointer(dir: String) = new Path(dir, "_CURRENT")

  /** Load the current key set (empty frame when no state exists). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ptr = pointer(dir)
    val fs = ptr.getFileSystem(conf)
    if (!fs.exists(ptr)) {
      import spark.implicits._
      Seq.empty[String].toDF("key")
    } else {
      val version = {
        val in = fs.open(ptr)
        try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      }
      spark.read.parquet(new Path(dir, version).toString)
    }
  }

  /** Split `batch` into never-seen rows and update the state with the
    * batch's keys. Returns the deduplicated batch. `keyCol` must already
    * exist on the batch (e.g. a fingerprint/content-hash column). */
  def filterAndAbsorb(batch: DataFrame, keyCol: String, dir: String): DataFrame = {
    val spark = batch.sparkSession
    val seen = load(spark, dir)
    // batch-internal dedup on the key with deterministic retention
    // (Dedup.stringified's min-full-row rule), then drop already-seen keys
    val fresh = graft.ops.Dedup.stringified(
      batch.join(seen.withColumnRenamed("key", keyCol), Seq(keyCol), "left_anti"),
      Seq(keyCol))
    val newState = seen.union(fresh.select(graft.ColNames.q(keyCol).as("key"))).distinct()

    // versioned write + pointer swap
    val conf = spark.sparkContext.hadoopConfiguration
    val ptr = pointer(dir)
    val fs = ptr.getFileSystem(conf)
    val current =
      if (fs.exists(ptr)) {
        val in = fs.open(ptr)
        try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      } else "v0"
    val next = "v" + (current.drop(1).toLong + 1)
    newState.write.mode("overwrite").parquet(new Path(dir, next).toString)
    val out = fs.create(ptr, true)
    try out.write(next.getBytes("UTF-8")) finally out.close()
    fresh
  }
}
