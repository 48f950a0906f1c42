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
  * Block cap, REPLAY-SAFE (`maxStreamBlock`): er1's global skew cap
  * cannot be replayed incrementally as a global drop (a block that
  * crosses the cap mid-stream has already emitted its early pairs), but
  * the per-block delivered-record count is MONOTONE in batch id, so
  * "the block crossed the cap at batch b" is a deterministic,
  * replay-stable fact. Capped semantics: a block pairs at batch f iff
  * its CUMULATIVE delivered-record count THROUGH f (prefix + this
  * batch) is ≤ cap — pairs emitted before the crossing batch stay, the
  * crossing batch itself does NOT pair the block (closing only from
  * the NEXT batch would let a degenerate key's first oversized batch
  * pair new×new, quadratic in the batch — the round-12 shape ADVICE
  * flagged), and the crossing batch appends the block to a per-batch
  * QUARANTINE delta (`(block_key, crossed_batch, cum_count)`,
  * overwritten on replay like every other delta) for batch-engine
  * recap — w18's multi-parent trade, made incremental. A replayed
  * batch recomputes the same counts, so the open/closed decision and
  * both deltas are replay-identical. `maxStreamBlock = None` keeps the
  * uncapped mode.
  *
  * At 100 TB: per batch, the new side is batch-sized and the registry
  * join is an equi-join on the block key — the registry never re-pairs
  * with itself, so per-batch cost tracks the batch × its block
  * neighbourhoods; under a cap every pairing block holds ≤ cap records
  * TOTAL, so pair work is genuinely ≤ batch × cap even when a
  * degenerate key arrives all at once (the blank-name block quarantines
  * instead of fanning out), and state grows by exactly the delivered
  * records. The closed-block set is bounded by deliveries/cap, so the
  * anti-join probe rides a broadcast. */
object ErStream {

  /** Absorb one micro-batch of records: registry delta + match delta,
    * both overwritten on replay. `records` must carry `id` and `attr`
    * plus whatever columns `block` reads. */
  def absorb(
      batch: DataFrame, id: String, attr: String, block: Column,
      minSimBp: Int, stateDir: String, batchId: Long,
      maxStreamBlock: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    batch.write.mode("overwrite").parquet(s"$stateDir/reg/b$batchId")
    val prior = registry(spark, stateDir, batchId)
    val all = prior match {
      case Some(reg) => reg.withColumn("__new", lit(false))
        .unionByName(batch.withColumn("__new", lit(true)))
      case None => batch.withColumn("__new", lit(true))
    }
    val pairInput = maxStreamBlock match {
      case None => all
      case Some(cap) =>
        // per-block prefix (registry) and batch counts — one tiny keyed
        // aggregate; both are pure functions of the delivered batch set,
        // so a replay recomputes them verbatim
        val counts = all.select(block.as("_bk"), col("__new"))
          .filter(col("_bk").isNotNull)
          .groupBy("_bk").agg(
            count(when(not(col("__new")), 1)).as("_prior"),
            count(when(col("__new"), 1)).as("_batch"))
        // blocks CROSSING the cap in this batch → quarantine delta
        // (replay overwrites its own delta, w18/t22 discipline)
        counts
          .filter(col("_prior") <= cap && col("_prior") + col("_batch") > cap)
          .select(col("_bk").as("block_key"),
            lit(batchId).as("crossed_batch"),
            (col("_prior") + col("_batch")).as("cum_count"))
          .write.mode("overwrite").parquet(s"$stateDir/quarantine/b$batchId")
        // a block is closed once its cumulative count THROUGH this batch
        // exceeds the cap — including the crossing batch itself, which
        // is what bounds a degenerate key's first batch at ≤ cap² pairs
        // instead of batch²; the closed set is ≤ deliveries/cap keys
        // plus this batch's crossers → broadcast anti-probe
        val closed = counts.filter(col("_prior") + col("_batch") > cap)
          .select(col("_bk").as("__cbk"))
        all.join(closed, block === col("__cbk"), "left_anti")
    }
    val cand = graft.ext.EntityResolution.candidatesTouching(
      pairInput, id, block, col("__new"))
    graft.ext.EntityResolution.scorePairs(all, id, attr, cand, minSimBp)
      .write.mode("overwrite").parquet(s"$stateDir/matches/b$batchId")
  }

  /** The folded quarantine list: blocks whose cumulative delivered-record
    * count crossed the stream cap, with the (replay-stable) batch where
    * they crossed — the work-list a batch-engine recap consumes. Assumes
    * a string block key (this engine's er block shape). */
  def quarantined(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = deltaDirs(spark, s"$stateDir/quarantine", None)
    if (dirs.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, Long, Long)].toDF("block_key", "crossed_batch", "cum_count")
    } else spark.read.parquet(dirs: _*)
  }

  private def deltaDirs(
      spark: SparkSession, dir: String, below: Option[Long]): Seq[String] =
    StateDirs.deltas(spark, dir)
      .filter { case (id, _) => below.forall(id < _) }
      .map(_._2)

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
      minSimBp: Int, stateDir: String, ckptDir: String,
      maxStreamBlock: Option[Int] = None): StreamingQuery =
    records.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorb(batch, id, attr, block, minSimBp, stateDir, bid, maxStreamBlock)
      }
      .start()
}
