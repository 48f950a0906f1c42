package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** t22 — INCREMENTAL heavy hitters: t21's streaming twin. Each arriving
  * micro-batch of documents is summarized by the mergeable Misra–Gries
  * aggregate ([[graft.functions.HeavyHitters.mgTopK]]) and ONLY the
  * ≤ budget summary rows land in a per-batch state delta — the log grows
  * by the sketch size per batch, never the vocabulary, and no raw term
  * ever crosses a batch boundary. The terminal fold sums estimates per
  * term across deltas.
  *
  * Why the fold keeps the MG guarantee (Agarwal et al., "Mergeable
  * Summaries", PODS'12): per batch b, `est_b(t) ≤ true_b(t)` and
  * `(true_b(t) − est_b(t))·(B+1) ≤ n_b`. Summing over batches:
  * `est(t) ≤ true(t)` and `(true(t) − est(t))·(B+1) ≤ Σ n_b = n` — the
  * exact bound t21's gate checks. Presence of every heavy term follows
  * by averaging: `true(t)·(B+1) > n` forces some batch with
  * `true_b(t)·(B+1) > n_b`, where MG presence is guaranteed.
  *
  * Replay-safe by OVERWRITE-idempotence (per-batch deltas keyed by batch
  * id) and order-independent by algebra (the fold is a commutative
  * associative sum) — both the w17/w18 disciplines at once.
  */
object HeavyHitterStream {

  /** Summarize one batch's `term` column into `stateDir/sk/b<batchId>`
    * (≤ budget rows, overwritten on replay). */
  def absorb(
      batch: DataFrame, termCol: String,
      stateDir: String, batchId: Long, budget: Int): Unit =
    batch
      .agg(graft.functions.HeavyHitters.mgTopK(col(termCol), budget).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term").as("term"), col("e.est").as("est"))
      .write.mode("overwrite").parquet(s"$stateDir/sk/b$batchId")

  /** The folded summary: per-term estimate sums across every delta.
    * Empty frame when no batch has arrived. */
  def folded(spark: SparkSession, stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/sk")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltas =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("b"))
        .map(st => st.getPath.toString)
    if (deltas.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("term", "est")
    } else spark.read.parquet(deltas: _*)
      .groupBy(col("term")).agg(sum(col("est")).as("est"))
  }

  /** Wire a streaming frame with a `term` column into per-batch
    * [[absorb]] calls. */
  def start(
      terms: DataFrame, termCol: String, stateDir: String, ckptDir: String,
      budget: Int): StreamingQuery =
    terms.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        absorb(batch, termCol, stateDir, id, budget)
      }
      .start()
}
