package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** w36 — STREAMING community maintenance: g7's incremental twin on the
  * shared LSM edge log ([[PageRankStream]]'s substrate — log once,
  * fold many). Synchronous label propagation is a function of the edge
  * SET (its first move canonicalizes + DISTINCTs the union), so the
  * logged state absorbs re-delivery and reordering by algebra, and the
  * terminal fold reproduces batch truth label for label.
  *
  * Same disclosed trade as w33/w35: community labels are a global
  * propagation — one bridging edge can relabel entire components, so
  * materialized labels have no append-only form. The log absorbs
  * deltas at append cost; the fixed-round fold runs when communities
  * are demanded. */
object LpaStream {

  /** The log substrate is w33's, verbatim. */
  def start(stream: DataFrame, srcCol: String, dstCol: String,
            logDir: String, checkpointDir: String): StreamingQuery =
    PageRankStream.start(stream, srcCol, dstCol, logDir, checkpointDir)

  /** Terminal fold: batch synchronous LPA over the logged edge set —
    * must equal [[graft.ops.Graph.labelPropagation]] on the union of
    * all deliveries (the w36 gate: g7's unrolled oracle verbatim). */
  def fold(spark: SparkSession, logDir: String, iters: Int = 3): DataFrame =
    graft.ops.Graph.labelPropagation(
      PageRankStream.loggedEdges(spark, logDir), "src", "dst", iters)
}
