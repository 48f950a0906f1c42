package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** w21 — INCREMENTAL entity resolution: er1's streaming twin.
  * Records arrive in micro-batches; each batch is linked against the
  * registry of everything delivered BEFORE it plus itself
  * ([[graft.ext.EntityResolution.candidatesTouching]] — pairs touch the
  * batch, the registry is never re-paired against itself), scored, and
  * the matches land in per-batch OVERWRITE deltas; the batch itself
  * joins the registry as its own overwrite delta. The terminal fold is
  * the distinct union of the match deltas and must equal the BATCH
  * linkage of the union of all deliveries — er1's SQL verbatim is the
  * oracle.
  *
  * Why the fold is complete: for any matched pair, consider the LATER
  * delivery of its two records — at that batch, the earlier record is
  * in the registry (or the same batch), the pair's block meets, and the
  * pair is scored. Exactly-once: within one batch the canonical filter
  * emits each pair once; across batches a pair can be re-emitted only
  * by a crash-replay, which overwrites its own delta (w18/t22
  * discipline) — and the distinct fold absorbs even cross-batch
  * duplicates, so delivery order and replays cannot change the folded
  * set (union algebra: idempotent ∘ commutative ∘ associative).
  *
  * Registry prefix rule: a batch links against deltas with batch id
  * STRICTLY BELOW its own, so a replayed batch recomputes from the same
  * prefix it originally saw (ids are monotone in delivery order) —
  * late-arriving extra matches against later batches would be true
  * pairs anyway (they are found by those later batches themselves), but
  * pinning the prefix keeps per-delta content deterministic, which is
  * what overwrite-idempotence stands on.
  *
  * Block-cap caveat (disclosed): the er1 skew cap drops OVERSIZE blocks
  * globally; a block that crosses the cap mid-stream would already have
  * emitted its early pairs. Incremental linkage therefore runs UNCAPPED
  * — at scales where a cap must bind, recap with the batch engine (the
  * same global-vs-incremental distinction j8 draws for multi-parent
  * graphs).
  *
  * At 100 TB: per batch, the new side is batch-sized and the registry
  * join is an equi-join on the block key — the registry never re-pairs
  * with itself, so per-batch cost tracks the batch × its block
  * neighbourhoods, and state grows by exactly the delivered records. */
object ErStream {

  /** Absorb one micro-batch of records: registry delta + match delta,
    * both overwritten on replay. `records` must carry `id` and `attr`
    * plus whatever columns `block` reads. */
  def absorb(
      batch: DataFrame, id: String, attr: String, block: Column,
      minSimBp: Int, stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    batch.write.mode("overwrite").parquet(s"$stateDir/reg/b$batchId")
    val prior = registry(spark, stateDir, batchId)
    val all = prior match {
      case Some(reg) => reg.withColumn("__new", lit(false))
        .unionByName(batch.withColumn("__new", lit(true)))
      case None => batch.withColumn("__new", lit(true))
    }
    val cand = graft.ext.EntityResolution.candidatesTouching(
      all, id, block, col("__new"))
    graft.ext.EntityResolution.scorePairs(all, id, attr, cand, minSimBp)
      .write.mode("overwrite").parquet(s"$stateDir/matches/b$batchId")
  }

  private def deltaDirs(
      spark: SparkSession, dir: String, below: Option[Long]): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b"))
      .filter(st => below.forall(b => st.getPath.getName.drop(1).toLong < b))
      .map(st => st.getPath.toString)
  }

  /** The registry of records delivered in batches BELOW `beforeBatch`
    * (None when nothing precedes). */
  def registry(
      spark: SparkSession, stateDir: String, beforeBatch: Long): Option[DataFrame] = {
    val dirs = deltaDirs(spark, s"$stateDir/reg", Some(beforeBatch))
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** The folded matched-pair set across every delivered batch. */
  def folded(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = deltaDirs(spark, s"$stateDir/matches", None)
    if (dirs.isEmpty) {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("id_a", "id_b", "sim_bp")
    } else spark.read.parquet(dirs: _*).distinct()
  }

  /** Wire a streaming record frame into per-batch [[absorb]] calls. */
  def start(
      records: DataFrame, id: String, attr: String, block: Column,
      minSimBp: Int, stateDir: String, ckptDir: String): StreamingQuery =
    records.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorb(batch, id, attr, block, minSimBp, stateDir, bid)
      }
      .start()
}
