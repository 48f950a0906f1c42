package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** w35 — STREAMING triangle-count maintenance: g6's incremental twin
  * on the SAME LSM edge log as w33 ([[PageRankStream]]) — log once,
  * fold many: one append-only edge log serves every graph consumer
  * (ranks, triangles, communities), because each fold's first move is
  * DISTINCT over the logged union and set union is idempotent ∘
  * commutative ∘ associative. Re-delivered or reordered batches append
  * rows the fold absorbs — replay-safe BY ALGEBRA, not checkpoint.
  *
  * The disclosed w22/w33 trade, same shape: triangle counts are a
  * JOIN-global quantity — one new edge can close wedges against every
  * earlier edge, so there is no per-arrival O(delta) maintenance of
  * the counts themselves without keeping the full adjacency as
  * queryable state anyway (that state IS the log). The replay-safe
  * state is the edge log at append cost; the degree-oriented wedge
  * join ([[graft.ops.Graph.triangles]], O(m^1.5) worst case) runs
  * when counts are DEMANDED — the consumer's schedule, not the
  * arrival rate. */
object TriangleStream {

  /** The log substrate is w33's, verbatim — one log format, many folds. */
  def start(stream: DataFrame, srcCol: String, dstCol: String,
            logDir: String, checkpointDir: String): StreamingQuery =
    PageRankStream.start(stream, srcCol, dstCol, logDir, checkpointDir)

  /** Terminal fold: the batch degree-oriented wedge join over the
    * logged edge set — counts must equal [[graft.ops.Graph.triangles]]
    * on the union of all deliveries (the w35 gate: g6's relational
    * oracle verbatim over the delivered log). */
  def fold(spark: SparkSession, logDir: String): DataFrame =
    graft.ops.Graph.triangles(
      PageRankStream.loggedEdges(spark, logDir), "src", "dst")
}
