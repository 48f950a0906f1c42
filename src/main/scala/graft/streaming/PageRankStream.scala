package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** w33 — INCREMENTAL graph-rank maintenance: g1's streaming twin
  * (round-16, the r15 VERDICT's #4-adjacent w-row). Edge DELTAS arrive
  * over micro-batches (a crawler discovering links, an ER pipeline
  * emitting entity edges); each batch APPENDS its distinct edges to an
  * edge log — the w17/w22 LSM discipline (append-only state, never a
  * registry rewrite) — and the terminal fold runs the batch
  * [[graft.ops.Graph.pageRank]] iteration over the logged union.
  *
  * Replay-safe BY ALGEBRA, not checkpoint: ranks are a function of the
  * edge SET (pageRank's first move is DISTINCT), and set union is
  * idempotent ∘ commutative ∘ associative — re-delivered or reordered
  * batches append rows the fold absorbs (StreamingSpec pins both).
  *
  * What stays deliberately NON-incremental — the w22 trade, disclosed:
  * materialized RANKS. PageRank is a global fixpoint — one new edge
  * shifts mass through every path that crosses it, so there is no
  * append-only form of the rank vector itself (true incremental PPR
  * maintenance exists — Bahmani et al. 2010's Monte-Carlo fingerprints
  * — but trades exactness for it, and this library's ranks are
  * oracle-exact integers). The replay-safe state is the edge LOG; rank
  * materialization is the terminal fold (or a periodic compaction job
  * over the same log), paid when ranks are DEMANDED rather than per
  * arrival — at 100 TB the log absorbs deltas at append cost while the
  * expensive global iteration runs on the consumer's schedule. */
object PageRankStream {

  /** Append one edge delta's distinct edges to the log. Pure function
    * of the delta — the spec replays batches in arbitrary orders. */
  def absorb(edges: DataFrame, srcCol: String, dstCol: String,
             logDir: String): Unit = {
    edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .write.mode("append").parquet(s"$logDir/edges")
  }

  /** foreachBatch driver: every arriving micro-batch of (src, dst)
    * edges is absorbed into the log. */
  def start(stream: DataFrame, srcCol: String, dstCol: String,
            logDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        absorb(batch, srcCol, dstCol, logDir)
      }
      .start()

  /** The logged edge set (distinct union of every delta); absent log →
    * empty frame (no delta ever arrived). */
  def loggedEdges(spark: SparkSession, logDir: String): DataFrame = {
    import spark.implicits._
    try spark.read.parquet(s"$logDir/edges").distinct()
    catch { case _: org.apache.spark.sql.AnalysisException =>
      Seq.empty[(Long, Long)].toDF("src", "dst")
    }
  }

  /** Terminal fold: the batch PageRank over the logged edges — ranks
    * must equal [[graft.ops.Graph.pageRank]] on the union of all
    * deliveries (the w33 gate's equality: g1's unrolled-SQL oracle
    * verbatim over the delivered log). */
  def fold(spark: SparkSession, logDir: String, iters: Int = 5,
           dampingMil: Int = 850,
           redistributeDangling: Boolean = false): DataFrame =
    graft.ops.Graph.pageRank(loggedEdges(spark, logDir), "src", "dst",
      iters = iters, dampingMil = dampingMil,
      redistributeDangling = redistributeDangling)
}
