package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ext.TextAnalysis

/** w29 — STREAMING quality-classifier scoring: t14's model-based quality
  * filter applied to arriving documents, micro-batch by micro-batch,
  * under a FROZEN weight table (the trained linear model distilled to
  * integer-bp token weights — the fastText/DCLM quality-model shape).
  * Per batch the work is one compiled zero-shuffle scan projection
  * (TextAnalysis.classifierScore) plus two bounded appends; nothing ever
  * rescans the accumulated corpus, so the incremental path costs exactly
  * the batch path amortized.
  *
  * Scoring is per-row and STATELESS, so the folded scored log equals the
  * batch classifier over the delivered corpus verbatim — the judged gate
  * (w29) hashes the delivered log against t14's own relational oracle.
  * Replay safety: per-batch OVERWRITE deltas (w18/t22/w25 discipline) —
  * a checkpoint-recovery replay rewrites the same delta, never appends
  * duplicates.
  *
  * STALENESS is the operational risk of a frozen classifier (w25's
  * drift discipline): if the stream's distribution moves, the score
  * distribution moves with it while the weights stand still. Each batch
  * therefore writes an O(1) drift partial — row count, Σ logit_bp,
  * Σ keep — and [[drift]] exposes per-batch mean logit and keep rate so
  * a monitor can flag "refit needed" when later batches drift from the
  * first out-of-sample batch by more than a margin (the in-sample
  * bootstrap number is systematically optimistic — w25's lesson). The
  * refit itself is the batch engine's job, the same global-vs-
  * incremental split as w18/w21/w25. */
object QualityStream {

  /** Absorb one micro-batch: score against the frozen weight table,
    * land the scored delta and the drift partial (both overwritten on
    * replay). A trailing empty trigger writes nothing. */
  def absorb(batch: DataFrame, id: String, text: String,
             vocab: Map[String, Long], biasBp: Long, keepBp: Long,
             stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    TextAnalysis.classifierScore(batch, id, text, vocab, biasBp, keepBp)
      .write.mode("overwrite").parquet(s"$stateDir/scored/b$batchId")
    // the partial aggregates the delta AS WRITTEN (read-back, not a
    // recompute) so drift telemetry can never disagree with the log
    spark.read.parquet(s"$stateDir/scored/b$batchId")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("logit_bp")), lit(0L)).as("logit_bp_sum"),
        coalesce(sum(col("keep").cast("long")), lit(0L)).as("n_keep"))
      .select(lit(batchId).as("batch_id"), col("n"), col("logit_bp_sum"),
        col("n_keep"))
      .write.mode("overwrite").parquet(s"$stateDir/drift/b$batchId")
  }

  /** The folded scored log `(id, n_toks, logit_bp, keep)` across every
    * delivered batch — row-for-row the batch classifier's output over
    * the delivered corpus. */
  def delivered(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = StateDirs.deltas(spark, s"$stateDir/scored").map(_._2)
    require(dirs.nonEmpty, s"no scored deltas under $stateDir")
    spark.read.parquet(dirs: _*)
  }

  /** Per-batch staleness monitor rows `(batch_id, n, mean_logit_bp,
    * keep_rate_bp)` — integer fixed point (t18 discipline). */
  def drift(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = StateDirs.deltas(spark, s"$stateDir/drift").map(_._2)
    require(dirs.nonEmpty, s"no drift partials under $stateDir")
    spark.read.parquet(dirs: _*)
      .select(col("batch_id"), col("n"),
        expr("logit_bp_sum div n").as("mean_logit_bp"),
        expr("(n_keep * 10000) div n").as("keep_rate_bp"))
  }

  /** Wire a streaming document frame into per-batch [[absorb]] calls. */
  def start(docs: DataFrame, id: String, text: String,
            vocab: Map[String, Long], biasBp: Long, keepBp: Long,
            stateDir: String, ckptDir: String): StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: DataFrame, bid: Long) =>
        absorb(b, id, text, vocab, biasBp, keepBp, stateDir, bid)
      }
      .start()
}
