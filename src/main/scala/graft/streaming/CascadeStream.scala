package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** w18 — INCREMENTAL cascade delete: J8's streaming twin
  * (`cds_transformation_functions.py:171-195` gives the batch semantics;
  * [[graft.ops.Cascade]] is the batch engine). Deletion keys for a ROOT
  * node arrive over micro-batches; each batch's delta cascades down a
  * single-parent chain and every node's newly-deleted keys APPEND to a
  * per-node state log — the w17 LSM discipline (append-only logs, no
  * registry rewrite, terminal fold reads logs).
  *
  * Replay-safe BY ALGEBRA, not by checkpoint: a node's deleted set is a
  * grow-only UNION of per-batch deltas — idempotent ∘ commutative ∘
  * associative — so a re-delivered batch appends duplicate rows the
  * fold's `distinct` absorbs, and out-of-order delivery folds to the
  * same state (StreamingSpec pins both). The cascade of a delta is
  * independent of previously-accumulated deletions precisely because
  * the chain is SINGLE-parent: a child dies iff its one pointer dies,
  * so `delta(child) = child ⋉ delta(parent)` needs no global state.
  * A MULTI-parent graph ("all pointers null" rule) does need the
  * accumulated pointer state per row — that shape stays on the batch
  * engine ([[graft.ops.Cascade.delete]]), which a periodic compaction
  * job can run over the same logs.
  *
  * Scale shape: a deletion delta is small relative to the corpus (it is
  * one arrival batch), so each per-level probe is `broadcast(delta)`
  * against the static node table — a map-side semi-join, no corpus
  * shuffle, and log appends are delta-sized. Rows whose pointer is
  * intrinsically NULL (deleted by the `dropna(how='all')` leg of J8
  * regardless of arrivals) are data-plane facts, not stream state —
  * the fold derives them from the static table, keeping the logs pure
  * delta unions.
  */
object CascadeStream {

  /** One chain level below the root: `node`'s `fk` column holds values of
    * the PREVIOUS level's key; `key` is this node's own key column. */
  final case class Level(node: String, df: DataFrame, fk: String, key: String)

  /** Absorb one deletion delta (single column of root keys): append the
    * root delta and each level's induced delta to `logDir/<node>`.
    * Pure function of (delta, static tables) — callable outside a stream
    * (the spec replays batches in arbitrary orders through it). */
  def absorb(delta: DataFrame, chain: Seq[Level], logDir: String): Unit = {
    val d0 = delta.toDF("key").distinct().persist()
    val persisted = scala.collection.mutable.ArrayBuffer(d0)
    try {
      d0.write.mode("append").parquet(s"$logDir/__root")
      var prev = d0
      for (Level(node, df, fk, key) <- chain) {
        val dn = df
          .join(broadcast(prev.select(col("key").as(fk))), Seq(fk))
          .select(col(key).as("key")).distinct().persist()
        persisted += dn
        dn.write.mode("append").parquet(s"$logDir/$node")
        prev = dn
      }
    } finally persisted.foreach { p => p.unpersist(); () }
  }

  /** The accumulated deleted-key set for one chain node (or `__root`):
    * the log folded by `distinct`. Absent/empty log → empty set (a node
    * no delta ever reached). */
  def deleted(spark: SparkSession, logDir: String, node: String): DataFrame = {
    import spark.implicits._
    try spark.read.parquet(s"$logDir/$node").distinct()
    catch { case _: org.apache.spark.sql.AnalysisException =>
      Seq.empty[Long].toDF("key")
    }
  }

  /** Wire `deletions` (streaming, one column of root keys) into the
    * per-batch [[absorb]]. Caller folds with [[deleted]] when done. */
  def start(
      deletions: DataFrame, chain: Seq[Level],
      logDir: String, ckptDir: String): StreamingQuery =
    deletions.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        absorb(batch, chain, logDir)
      }
      .start()
}
