package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-run/cross-batch exact-dedup state: a parquet table of content
  * keys already seen (fingerprints, content hashes, natural ids). The
  * incremental twin of the batch hash-groupBy dedup — each batch keeps
  * only never-seen rows (`left_anti` against the state), then the state
  * absorbs the batch's keys.
  *
  * Storage is append-only deltas with periodic compaction (the LSM shape):
  * each batch writes ONLY its own fresh keys as a new `delta-N` parquet
  * dir; every `compactEvery` batches the manifest's files are merged into
  * one `base-N`. An atomic `_CURRENT` manifest (newline-separated relative
  * paths, committed by write-to-temp + overwrite-rename) lists the live
  * files, so a reader mid-compaction still sees a consistent older state
  * (single-writer discipline; the reference's whole-file YAML rewrite made
  * atomic — SURVEY.md §7.4 risk 5).
  *
  * Scale posture (the round-2 version rewrote the FULL key set every
  * batch — O(|state|) per batch, a non-starter at 10¹¹ keys):
  *  - per-batch write cost is O(|batch|): one narrow delta file;
  *  - compaction is O(|state|) but amortized over `compactEvery` batches,
  *    and the read path between compactions is a union of ≤ compactEvery
  *    parquet dirs — Spark scans them as one multi-path relation;
  *  - the anti-join read path shuffles only (batch keys ∪ state); for
  *    latency-critical paths the same contract can move to a streaming
  *    `dropDuplicates` + watermark state store; this parquet form is
  *    replayable and engine-restart-proof.
  */
object SeenKeys {

  private def pointer(dir: String) = new Path(dir, "_CURRENT")

  private def readManifest(fs: FileSystem, dir: String): Seq[String] = {
    val ptr = pointer(dir)
    if (!fs.exists(ptr)) Seq.empty
    else {
      val in = fs.open(ptr)
      val text = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    }
  }

  /** Commit the manifest via write-to-temp + overwrite-rename:
    * `fs.create(ptr, true)` truncates in place, so a reader (or crash)
    * mid-write would observe an empty manifest and silently re-admit
    * previously-seen keys. `FileContext.rename(OVERWRITE)` is the atomic
    * commit point on HDFS and local filesystems — a reader sees either the
    * old manifest or the new one, never a truncated byte stream and never
    * a missing pointer. */
  private def writeManifest(fs: FileSystem, dir: String, entries: Seq[String]): Unit = {
    val ptr = pointer(dir)
    val tmp = new Path(dir, "_CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.mkString("\n").getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, fs.getConf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(ptr),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Load the current key set (empty frame when no state exists). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val fs = pointer(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = readManifest(fs, dir)
    if (entries.isEmpty) {
      import spark.implicits._
      Seq.empty[String].toDF("key")
    } else {
      spark.read.parquet(entries.map(e => new Path(dir, e).toString): _*)
        .select("key")
    }
  }

  /** Split `batch` into never-seen rows and update the state with the
    * batch's keys. Returns the deduplicated batch. `keyCol` must already
    * exist on the batch (e.g. a fingerprint/content-hash column).
    *
    * @param compactEvery merge the state into a single base dir whenever
    *        the manifest would exceed this many files. Compaction does NOT
    *        delete the superseded files — the returned frame's anti-join
    *        lineage (and any reader holding the prior manifest) still
    *        reads them; reclaim space with [[vacuum]] once those frames
    *        are consumed.
    */
  def filterAndAbsorb(
      batch: DataFrame,
      keyCol: String,
      dir: String,
      compactEvery: Int = 16): DataFrame = {
    val fresh = filterNew(batch, keyCol, dir)
    absorb(fresh.select(graft.ColNames.q(keyCol).as("key")), dir, compactEvery)
    fresh
  }

  /** The read side of [[filterAndAbsorb]] alone: batch-internal dedup on
    * the key (deterministic retention) + anti-join against the state,
    * WITHOUT absorbing the keys. Callers that need exactly-once against
    * replays (e.g. a streaming `foreachBatch`) filter first, commit their
    * outputs, then [[absorb]] — see [[graft.pipeline.Incremental]]. */
  def filterNew(batch: DataFrame, keyCol: String, dir: String): DataFrame = {
    val seen = load(batch.sparkSession, dir)
    graft.ops.Dedup.stringified(
      batch.join(seen.withColumnRenamed("key", keyCol), Seq(keyCol), "left_anti"),
      Seq(keyCol))
  }

  /** The write side: fold `freshKeys(key)` into the state (one delta, or a
    * compaction when the manifest is full). */
  def absorb(freshKeys: DataFrame, dir: String, compactEvery: Int = 16): Unit = {
    val spark = freshKeys.sparkSession
    val seen = load(spark, dir)
    val fs = pointer(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = readManifest(fs, dir)
    val nextIdx = entries
      .flatMap(e => e.dropWhile(!_.isDigit).toLongOption)
      .maxOption.getOrElse(0L) + 1
    if (entries.size + 1 > compactEvery) {
      // compaction turn: fold every live file + this batch into one base
      val p = s"base-$nextIdx"
      seen.union(freshKeys).distinct()
        .write.mode("overwrite").parquet(new Path(dir, p).toString)
      writeManifest(fs, dir, Seq(p))
    } else {
      // O(|batch|) turn: append one delta, leave prior files untouched
      val p = s"delta-$nextIdx"
      freshKeys.write.mode("overwrite").parquet(new Path(dir, p).toString)
      writeManifest(fs, dir, entries :+ p)
    }
  }

  /** Delete state files no longer referenced by the manifest (superseded
    * by a compaction). Safe once no outstanding frame from an earlier
    * [[filterAndAbsorb]]/[[load]] is still unconsumed. */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val fs = pointer(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    if (fs.exists(root)) {
      val live = readManifest(fs, dir).toSet + "_CURRENT"
      fs.listStatus(root)
        .filterNot(st => live.contains(st.getPath.getName))
        // _absorbed-* are Incremental's replay markers, not state files —
        // they self-clean (latest-only) and must survive vacuum
        .filterNot(_.getPath.getName.startsWith("_absorbed-"))
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}
