package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Snapshots

/** w27 — streaming CDC apply: a change stream of `upsert`/`delete` ops
  * lands on the [[graft.ops.Snapshots]] table as MERGE semantics
  * (last-writer-wins per key), using only the table's own ACID
  * primitives — per micro-batch, ONE equality-delete commit for every
  * touched key (upserts delete their predecessor too) followed by ONE
  * append commit of the upsert payloads. The s22 sequence rule is what
  * makes the pair exactly an upsert: the delete applies only to data
  * committed BEFORE it, so the same batch's append survives while every
  * earlier version of the key dies.
  *
  * Crash contract: the two commits are not atomic as a PAIR, and a
  * foreachBatch replay re-runs both — that is SAFE for table CONTENT
  * (the replayed delete kills the half-applied batch's own rows before
  * the replayed append re-adds them; convergence by the sequence rule,
  * not by idempotent snapshot ids — the snapshot CHAIN length is
  * nondeterministic under replay, disclosed, so gates fingerprint
  * content, never chain shape).
  *
  * Precondition: within one batch a key carries at most one op (the
  * standard CDC-compaction contract); a batch violating it would make
  * delete-vs-upsert ordering ambiguous. [[absorb]] ENFORCES this with
  * a batch-sized key-count check and fails loudly on violation —
  * silent order-ambiguous merges are the one corruption class a
  * replayable sink cannot repair.
  *
  * At 100 TB: per batch, two commits whose cost is batch-sized (delete
  * key sets are single-column); reads pay the merge-on-read anti-joins
  * until [[graft.ops.Snapshots.commitRewrite]] compacts — the
  * standard CDC-lakehouse maintenance split. */
object CdcStream {

  /** Batch shape from [[probeBatch]]'s single pass: row/upsert counts
    * (0 rows = skip the batch, 0 upserts = skip the append leg). */
  private final case class BatchProbe(nRows: Long, nUpserts: Long)

  /** ONE batch-sized aggregate (round-20, guide §7 driver-side costs)
    * answering every absorb precondition that used to cost a separate
    * driver action — emptiness (`isEmpty`), the one-op-per-key
    * contract, unrecognized ops, and the upsert count (the old
    * `ups.isEmpty` probe). Each action on a foreachBatch frame plans
    * and schedules its own ~200 ms job; four probes per micro-batch
    * were most of w27/w34's driver-gap time. Violations still die
    * loudly with the same require()s BEFORE any commit runs. */
  private def probeBatch(batch: DataFrame, keyCol: String, opCol: String,
                         who: String): BatchProbe = {
    val known = coalesce(col(opCol).isin("upsert", "delete"), lit(false))
    val r = batch
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"),
        sum(when(known, 0L).otherwise(1L)).as("__nbad"),
        max(when(!known, coalesce(col(opCol), lit("null")))).as("__bad"),
        sum(when(col(opCol) === "upsert", 1L).otherwise(0L)).as("__nup"))
      .agg(sum(col("__n")).as("nrows"),
        max(col("__n")).as("maxn"),
        max_by(col(keyCol).cast("string"), col("__n")).as("dupkey"),
        sum(col("__nbad")).as("nbad"),
        max(col("__bad")).as("badop"),
        sum(col("__nup")).as("nup"))
      .collect()(0)
    if (r.isNullAt(0)) return BatchProbe(0L, 0L) // empty batch
    require(r.getLong(1) == 1L,
      s"$who: key '${r.getString(2)}' carries " +
        s"${r.getLong(1)} ops in one batch - the one-op-per-key " +
        "CDC contract is violated; compact the feed per batch first")
    require(r.getLong(3) == 0L,
      s"$who: ${r.getLong(3)} row(s) carry unrecognized op " +
        s"'${r.getString(4)}' (expected exactly 'upsert'/'delete') - such " +
        "rows would silently vanish from the merge; fix the feed")
    BatchProbe(r.getLong(0), r.getLong(5))
  }

  /** Apply one CDC micro-batch: `opCol` ∈ {upsert, delete}; all other
    * columns are the payload (the key column included). */
  def absorb(batch: DataFrame, tableDir: String, keyCol: String,
             opCol: String): Unit = {
    val spark = batch.sparkSession
    // one fused probe (see [[probeBatch]]): emptiness, the
    // one-op-per-key precondition, op validity, and the upsert count —
    // a violating feed must die loudly here, not merge ambiguously
    val probe = probeBatch(batch, keyCol, opCol, "CdcStream.absorb")
    if (probe.nRows == 0L) return
    val touched = batch.select(col(keyCol)).distinct()
    // nothing to delete from an empty table (first batch bootstrap)
    if (Snapshots.current(spark, tableDir).isDefined)
      Snapshots.commitDelete(touched, tableDir, keyCol)
    if (probe.nUpserts > 0L) {
      Snapshots.commitAppend(batch.filter(col(opCol) === "upsert").drop(opCol),
        tableDir); ()
    }
  }

  /** Wire a streaming CDC frame into per-batch [[absorb]] calls. */
  def start(ops: DataFrame, tableDir: String, keyCol: String,
            opCol: String, ckptDir: String): StreamingQuery =
    ops.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        absorb(batch, tableDir, keyCol, opCol)
      }
      .start()

  /** [[absorb]]'s ATOMIC successor (round-15, built on
    * [[graft.ops.Snapshots.commitMergeKeyed]]): the whole micro-batch —
    * every superseded key AND every upsert payload — lands as ONE
    * manifest, so readers see each batch entirely or not at all (the
    * two-commit form exposed a half-applied window), and the batch-id
    * TAG makes foreachBatch replays exactly-once: a replayed batch gets
    * its committed id back instead of re-merging, so the snapshot CHAIN
    * is now deterministic (one commit per batch) — the disclosed
    * nondeterminism of [[absorb]]'s crash contract is gone, and gates
    * may judge chain shape, not just content. Same one-op-per-key
    * precondition, enforced the same way. */
  def absorbAtomic(batch: DataFrame, tableDir: String, keyCol: String,
                   opCol: String, tag: Option[String]): Unit = {
    val spark = batch.sparkSession
    // one fused probe for emptiness + both preconditions + the upsert
    // count (see [[probeBatch]]) — was four separate driver actions
    val probe = probeBatch(batch, keyCol, opCol, "CdcStream.absorbAtomic")
    if (probe.nRows == 0L) return
    val ups = batch.filter(col(opCol) === "upsert").drop(opCol)
    val dels = batch.filter(col(opCol) === "delete").select(keyCol)
    if (Snapshots.current(spark, tableDir).isEmpty) {
      // bootstrap: nothing to supersede — a tagged plain append (the
      // delete leg of a merge needs an existing delete-key contract)
      if (probe.nUpserts > 0L) { Snapshots.commitAppend(ups, tableDir, tag); () }
    } else {
      Snapshots.commitMergeKeyed(ups, dels, tableDir, keyCol, tag); ()
    }
  }

  /** Wire a streaming CDC frame into per-batch [[absorbAtomic]] calls,
    * tagged by the micro-batch id (the replay-exactness key). */
  def startAtomic(ops: DataFrame, tableDir: String, keyCol: String,
                  opCol: String, ckptDir: String): StreamingQuery =
    ops.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorbAtomic(batch, tableDir, keyCol, opCol, Some(s"cdc-$bid"))
      }
      .start()

  /** [[startAtomic]] + a CONTINUOUSLY-FRESH rollup (w34): after each
    * batch's atomic MERGE, fold the table's new CDC interval into the
    * materialized view at `mvDir`
    * ([[graft.ops.MaterializedView.refresh]]) — so between batches the
    * view always equals the full recompute of the table, at interval +
    * touched-groups cost. Replay is doubly exact-once: the MERGE by its
    * `cdc-<bid>` tag, the refresh by its source-watermark tag — a
    * replayed batch moves NEITHER chain. */
  def startAtomicMv(ops: DataFrame, tableDir: String, keyCol: String,
                    opCol: String, ckptDir: String, mvDir: String,
                    groupCol: String, sumCols: Seq[String]): StreamingQuery =
    ops.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorbAtomic(batch, tableDir, keyCol, opCol, Some(s"cdc-$bid"))
        if (Snapshots.current(batch.sparkSession, tableDir).isDefined) {
          graft.ops.MaterializedView.refresh(batch.sparkSession,
            tableDir, mvDir, groupCol, sumCols); ()
        }
      }
      .start()
}
