package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Snapshots
import graft.validate.Checks

/** w37 — STREAMING constraint-gated ingest with a DEAD-LETTER table:
  * every micro-batch goes through [[Snapshots.commitAppendChecked]]
  * (s36's stage-audit-publish); a batch that violates the contract
  * lands ATOMICALLY in the QUARANTINE table instead of poisoning the
  * main one — the standard expectations pipeline (Delta's
  * badRecordsPath / dbt's store_failures, done as two snapshot tables
  * so both sides keep full ACID + time travel + CDC).
  *
  * Exactly-once on BOTH sides: the main-side tag rides the publish
  * manifest and the quarantine-side tag its append manifest, both
  * keyed by the micro-batch id — a checkpoint-replayed batch re-runs
  * its audit (staged scaffolding is vacuum's ordinary garbage) and
  * then finds its tag, landing nothing twice. Readers of main can
  * NEVER observe a contract-violating state; the quarantine table is
  * the complete, queryable record of what bounced and when. */
object CheckedIngestStream {

  /** One micro-batch's worth of work — pure function of (batch, bid),
    * so the spec can replay deliveries deterministically. Exactly-once
    * is per (bid, side): a checkpoint replay re-offers the SAME batch
    * under the same bid and the tag probe absorbs it. */
  def absorb(batch: DataFrame, bid: Long, mainDir: String,
             quarantineDir: String, checks: Seq[Checks.Check],
             wholeTable: Boolean = false): Unit = {
    // an empty micro-batch is a no-op, not a Complete-check failure
    if (batch.isEmpty) return
    try {
      Snapshots.commitAppendChecked(batch, mainDir, checks,
        wholeTable, tag = Some(s"ingest-$bid"))
      ()
    } catch {
      case _: Snapshots.CheckViolationException =>
        Snapshots.commitAppend(batch, quarantineDir,
          tag = Some(s"quarantine-$bid"))
        ()
    }
  }

  def start(stream: DataFrame, mainDir: String, quarantineDir: String,
            checks: Seq[Checks.Check], checkpointDir: String,
            wholeTable: Boolean = false): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorb(batch, bid, mainDir, quarantineDir, checks, wholeTable)
      }
      .start()
}
