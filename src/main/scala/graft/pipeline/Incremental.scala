package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental (Structured Streaming) execution of the v1.3 pipeline:
  * wide Metadata rows arrive as a stream (e.g. a landing directory of
  * per-study extracts), and each micro-batch flows through the SAME
  * `Pipeline.run` used in batch mode via `foreachBatch`, appending
  * per-node output.
  *
  * Semantics note (deliberate): dedup/combine/id-validation are
  * BATCH-LOCAL. The reference's own unit of independence is the workbook
  * (one study per file, SURVEY.md §3.1) — a micro-batch of whole
  * workbooks reproduces its semantics exactly. CROSS-batch dedup is the
  * `crossBatchKey` option: each batch is anti-joined against the
  * [[graft.state.SeenKeys]] LSM state on that column, so a row
  * re-delivered in a later batch (or a re-submitted workbook) lands
  * exactly once, at O(|batch|) state cost per batch.
  *
  * Replay safety: `foreachBatch` re-runs a batchId after a crash. Keys
  * are absorbed into the state only AFTER the batch's outputs are
  * written, and the absorption is recorded under the batchId — so a
  * replayed batch either re-processes in full (crash before absorb;
  * output appends may duplicate, the usual at-least-once contract of an
  * append sink) or is recognized as absorbed and skipped entirely (crash
  * after). Absorbing FIRST would instead make the replayed batch's rows
  * look already-seen and silently drop them — at-most-once, data loss.
  */
object Incremental {

  def start(
      wideStream: DataFrame,
      specs: Seq[Pipeline.NodeSpec],
      outDir: String,
      checkpointDir: String,
      removeNodes: Set[String] = Set.empty,
      trigger: Trigger = Trigger.AvailableNow(),
      crossBatchKey: Option[(String, String)] = None): StreamingQuery =
    wideStream.writeStream
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        // marker names carry the CHECKPOINT identity, not just the batchId:
        // the SeenKeys dir outlives any one stream run (that is its point),
        // and foreachBatch batchIds restart at 0 with a fresh checkpoint —
        // a bare _absorbed-0 from a previous deployment would silently skip
        // a brand-new batch. String.hashCode is spec-stable across JVMs.
        val ns = f"${checkpointDir.hashCode}%08x"
        val marker = crossBatchKey.map { case (_, stateDir) =>
          new org.apache.hadoop.fs.Path(stateDir, s"_absorbed-$ns-$batchId")
        }
        val fs = marker.map(_.getFileSystem(spark.sparkContext.hadoopConfiguration))
        val alreadyAbsorbed =
          marker.zip(fs).exists { case (m, f) => f.exists(m) }
        if (!alreadyAbsorbed) {
          val batch = crossBatchKey match {
            case Some((keyCol, stateDir)) =>
              graft.state.SeenKeys.filterNew(batch0, keyCol, stateDir)
            case None => batch0
          }
          // one materialization: the anti-join + state scan would otherwise
          // re-run for every node write, every report, and the absorb
          if (crossBatchKey.isDefined) batch.persist()
          try {
            val result = Pipeline.run(batch, specs, removeNodes)
            result.nodes.foreach { case (node, df) =>
              df.write.mode("append").parquet(s"$outDir/$node")
            }
            result.reports.foreach { case (name, df) =>
              if (!df.isEmpty)
                df.write.mode("append").parquet(s"$outDir/_reports/$name")
            }
            // outputs committed -> now absorb the keys and mark the batch
            crossBatchKey.foreach { case (keyCol, stateDir) =>
              graft.state.SeenKeys.absorb(
                batch.select(graft.ColNames.q(keyCol).as("key")).distinct(), stateDir)
            }
            marker.zip(fs).foreach { case (m, f) =>
              f.create(m, true).close()
              // only the latest marker matters (streaming replays at most
              // the last uncommitted batch) — drop older ones so a
              // long-running stream leaves one marker, not one per batch
              val prefix = s"_absorbed-$ns-"
              f.listStatus(m.getParent).map(_.getPath)
                .filter(p => p.getName.startsWith(prefix) && p.getName != m.getName)
                .filter(_.getName.stripPrefix(prefix).toLongOption.exists(_ < batchId))
                .foreach(p => f.delete(p, false))
            }
          } finally if (crossBatchKey.isDefined) batch.unpersist()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
