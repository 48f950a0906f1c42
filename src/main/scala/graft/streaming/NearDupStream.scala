package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.TextDedup

/** Streaming near-duplicate dedup: the MinHash-LSH SCREEN tier
  * ([[graft.ext.TextDedup.lshCandidates]]) run incrementally over a
  * document stream — the corpus-ingest shape where new crawl shards
  * arrive continuously and must be deduplicated against everything
  * already accepted.
  *
  * Why `foreachBatch` + an LSM side table, not `flatMapGroupsWithState`:
  * a document consults `bands` state keys at once (one per band), which
  * no single keyed-state operator can express, and at 100 TB the
  * accumulated bucket registry outgrows any executor state store — the
  * real pattern is a persistent bucket table joined per micro-batch.
  * State is [[graft.state.SeenKeys]] (manifest + delta/compaction), so a
  * batch costs O(|batch| + |state-scan|) with the equi-join shapes of
  * the batch operator, and the registry survives stream restarts and
  * redeployments.
  *
  * Semantics (deterministic, arrival-order-free within a batch):
  * a document is a duplicate iff any of its band buckets is already
  * CLAIMED — by the accepted corpus (state) or by a smaller-id document
  * in the same batch. Survivors' buckets are absorbed; a dropped
  * document claims nothing. Bucket-granular first-wins slightly
  * over-drops versus transitive cluster-min (a doc can lose a bucket to
  * a doc that itself was dropped) — the screen-tier trade d7's recall
  * gate characterizes; full transitive clustering is the batch
  * [[graft.ops.Components]] job.
  *
  * INVARIANT: after every committed batch, `stateDir` holds exactly the
  * band-bucket keys of the documents appended to `outDir` — re-running a
  * stream over an old + new corpus mix drops every re-delivered (or
  * near-duplicate) document against the accepted registry.
  *
  * Replay safety follows [[graft.pipeline.Incremental]]: outputs append
  * first, then buckets absorb, then the batch marker commits — a batch
  * replayed after a crash before the marker re-processes in full
  * (at-least-once appends), one replayed after is skipped entirely.
  */
object NearDupStream {

  /** Band-bucket keys of a (static or micro-batch) doc frame:
    * `(id, bkey: string)`. The (band, key) pair packs into one xxhash64
    * then casts to string — [[graft.state.SeenKeys]]' single-key-column
    * contract. The pack adds a ~n²/2⁶⁴ false-collision rate on top of
    * the screen tier's own false-positive rate — negligible against it. */
  def bucketKeys(docs: DataFrame, id: String, text: String,
                 n: Int = 3, k: Int = 32, bands: Int = 8,
                 seed: Long = 42L): DataFrame = {
    val sig = docs.select(col(id),
      TextDedup.minhashSignature(
        graft.functions.VectorExpressions.shingleHash64(col(text), n), k, seed)
        .as("sig"))
    sig.select(col(id), explode(TextDedup.bandKeys(col("sig"), k, bands)).as("bk"))
      .select(col(id),
        xxhash64(col("bk.band"), col("bk.key")).cast("string").as("bkey"))
  }

  def start(
      docStream: DataFrame,
      outDir: String,
      checkpointDir: String,
      stateDir: String,
      id: String = "doc_id",
      text: String = "text",
      n: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        // marker carries the checkpoint identity (Incremental's rationale:
        // batchIds restart at 0 with a fresh checkpoint)
        val ns = f"${checkpointDir.hashCode}%08x"
        val marker = new org.apache.hadoop.fs.Path(stateDir, s"_done-$ns-$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          val batch = batch0.persist()
          val bk = bucketKeys(batch, id, text, n, k, bands).persist()
          // the dup-id set is consumed TWICE per batch — the kept-write's
          // anti-join and (via `kept`) the absorb's semi-join — and it is
          // the batch's whole join pipeline (state scan + first-per-bucket
          // aggregate). Cached (round-20, guide §5/§7.3), the absorb leg
          // reuses the materialized ids instead of re-running both joins;
          // the frame is tiny (≤ batch ids).
          val dups = {
            val seen = graft.state.SeenKeys.load(spark, stateDir)
            val dupVsState = bk
              .join(seen.withColumnRenamed("key", "bkey"), Seq("bkey"), "left_semi")
              .select(col(id))
            val firstPerBucket = bk.groupBy("bkey").agg(min(col(id)).as("_first"))
            val dupInBatch = bk.join(firstPerBucket, Seq("bkey"))
              .filter(col(id) > col("_first")).select(col(id))
            dupVsState.union(dupInBatch).distinct().persist()
          }
          try {
            val kept = batch.join(dups, Seq(id), "left_anti")
            kept.write.mode("append").parquet(outDir)
            // outputs committed -> absorb survivors' buckets, then mark
            graft.state.SeenKeys.absorb(
              bk.join(kept.select(col(id)), Seq(id), "left_semi")
                .select(col("bkey").as("key")).distinct(),
              stateDir)
            fs.create(marker, true).close()
          } finally {
            dups.unpersist()
            bk.unpersist()
            batch.unpersist()
          }
        }
        ()
      }
      .trigger(trigger)
      .start()
}
