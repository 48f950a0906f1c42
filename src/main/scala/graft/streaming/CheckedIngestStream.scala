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
  * keyed by (appId, micro-batch id) — the Delta idempotent-write
  * convention (txnAppId, txnVersion), NOT the bid alone: two queries
  * feeding the same table, or a restart under a rebuilt checkpoint
  * (bids restart at 0), carry DIFFERENT batches under the same bid,
  * and a bid-only tag would silently absorb them as already-committed.
  * [[start]] derives the appId from the checkpoint location (the
  * stable identity of a query's delivery state); callers of [[absorb]]
  * with their own replay machinery pass their own. A checkpoint-
  * replayed batch re-runs its audit (staged scaffolding is vacuum's
  * ordinary garbage) and then finds its tag, landing nothing twice.
  * Readers of main can NEVER observe a contract-violating state; the
  * quarantine table is the complete, queryable record of what bounced
  * and when. */
object CheckedIngestStream {

  /** Stable per-query identity derived from the checkpoint location —
    * what survives restarts exactly as long as the delivery state (and
    * its bid sequence) does. */
  def appIdFor(checkpointDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(checkpointDir.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** One micro-batch's worth of work — pure function of
    * (batch, appId, bid), so the spec can replay deliveries
    * deterministically. Exactly-once is per (appId, bid, side): a
    * checkpoint replay re-offers the SAME batch under the same
    * (appId, bid) and the tag probe absorbs it — on EITHER side: a
    * replay of a batch that was QUARANTINED short-circuits on the
    * quarantine tag before re-running the main-side audit, so a
    * wholeTable-scope contract that has since started passing cannot
    * double-land the batch (once in quarantine, again in main). */
  def absorb(batch: DataFrame, bid: Long, mainDir: String,
             quarantineDir: String, checks: Seq[Checks.Check],
             wholeTable: Boolean = false,
             appId: String = "default",
             legacyTagCompat: Boolean = false): Unit = {
    // an empty micro-batch is a no-op, not a Complete-check failure
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (Snapshots.findTag(spark, quarantineDir,
        s"quarantine-$appId-$bid").isDefined) return
    // OPT-IN upgrade shim (round-18): tables last written under the
    // pre-appId tag format (`ingest-<bid>` / `quarantine-<bid>`) would
    // otherwise not find their tag on a checkpoint replay that
    // straddles the upgrade and re-land the batch once. The probe
    // carries the legacy format's bid-only identity, which ABSORBS ANY
    // app's batch at a colliding bid — exactly the hazard the
    // (appId, bid) format fixed — so it must never run by default: a
    // NEW query pointed at a legacy-tagged table would silently skip
    // its first batches. Enable only for the one catch-up replay of
    // the query that wrote the legacy tags, then turn it off.
    if (legacyTagCompat &&
        (Snapshots.findTag(spark, mainDir, s"ingest-$bid").isDefined ||
         Snapshots.findTag(spark, quarantineDir,
           s"quarantine-$bid").isDefined)) return
    try {
      Snapshots.commitAppendChecked(batch, mainDir, checks,
        wholeTable, tag = Some(s"ingest-$appId-$bid"))
      ()
    } catch {
      case _: Snapshots.CheckViolationException =>
        Snapshots.commitAppend(batch, quarantineDir,
          tag = Some(s"quarantine-$appId-$bid"))
        ()
    }
  }

  def start(stream: DataFrame, mainDir: String, quarantineDir: String,
            checks: Seq[Checks.Check], checkpointDir: String,
            wholeTable: Boolean = false,
            legacyTagCompat: Boolean = false): StreamingQuery = {
    val appId = appIdFor(checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorb(batch, bid, mainDir, quarantineDir, checks, wholeTable,
          appId, legacyTagCompat)
      }
      .start()
  }
}
