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
  * [[graft.state.SeenKeys]] LSM state on that column and absorbed into it
  * before the pipeline runs, so a row re-delivered in a later batch (or a
  * re-submitted workbook) is dropped once and forever, at O(|batch|)
  * state cost per batch.
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
        val batch = crossBatchKey match {
          case Some((keyCol, stateDir)) =>
            graft.state.SeenKeys.filterAndAbsorb(batch0, keyCol, stateDir)
          case None => batch0
        }
        val result = Pipeline.run(batch, specs, removeNodes)
        result.nodes.foreach { case (node, df) =>
          df.write.mode("append").parquet(s"$outDir/$node")
        }
        result.reports.foreach { case (name, df) =>
          if (!df.isEmpty)
            df.write.mode("append").parquet(s"$outDir/_reports/$name")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
