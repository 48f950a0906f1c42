package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** w19 — INCREMENTAL gap sessionization: w3's streaming twin. The batch
  * form (lag + running-sum over a per-user window, 30-min gap —
  * SparkEntry w3_sessionize) re-sorts the whole corpus every run; here
  * each micro-batch is sessionized ALONE (a per-user window over
  * batch-sized data), merged against a per-user OPEN-session state row,
  * closed sessions append to a log, and only the still-open tail row per
  * user carries forward. Per-batch cost is O(batch + |open state|), never
  * O(corpus).
  *
  * PRECONDITION — time-ordered delivery: batch N+1's events must not
  * precede batch N's (the standard shape of an event log / kafka topic
  * partitioned by time). Within a batch any order is fine (the batch is
  * sorted by the window); ties on the boundary are safe because a
  * zero-second gap always merges. Out-of-order SOURCES need the batch
  * engine (w3) or a watermark-delayed staging step.
  *
  * Replay-safe BY CONSTRUCTION, not by checkpoint trust: state versions
  * are keyed by micro-batch id — `absorb(b)` reads open-state version
  * `maxId < b` and OVERWRITES `closed/b<b>` and `open/v<b>` — so a
  * re-delivered batch recomputes byte-identical outputs from the same
  * inputs (the w17/w18 discipline, with overwrite-idempotence replacing
  * union-algebra because session merge is not commutative).
  *
  * State stays bounded: users whose open session can no longer extend
  * (last_ts + gap < the batch's min ts — conservative under time-ordered
  * delivery) are closed and evicted each batch, so `open` holds only
  * recently-active users, not everyone ever seen.
  */
object SessionStream {

  private val openCols = Seq("user_id", "start_ts", "last_ts",
    "n_events", "first_event", "last_event")

  /** Latest committed open-state version strictly below `batchId`
    * (empty frame when none — first batch or fresh state). */
  def openState(spark: SparkSession, stateDir: String, batchId: Long): DataFrame = {
    val versions = listDirs(spark, s"$stateDir/open", "v").filter(_ < batchId)
    if (versions.isEmpty) emptyOpen(spark)
    else spark.read.parquet(s"$stateDir/open/v${versions.max}")
  }

  /** Child directories of `dir` named `<prefix><long>` (Hadoop FS — works
    * on s3a/hdfs, not just local disk). */
  private def listDirs(spark: SparkSession, dir: String, prefix: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .flatMap(st => scala.util.Try(st.getPath.getName.drop(prefix.length).toLong).toOption)
  }

  private def emptyOpen(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long, Long)]
      .toDF(openCols: _*)
  }

  /** Absorb one micro-batch of (user_id, event_id, ts) rows: sessionize
    * the batch, merge boundary sessions with the open state, overwrite
    * this batch's closed-delta and open-state version. Deterministic
    * function of (batch rows, prior state version) — replaying a batch id
    * rewrites identical state. */
  def absorb(
      spark: SparkSession, batch: DataFrame,
      stateDir: String, batchId: Long, gapSec: Long = 1800L): Unit = {
    val open = openState(spark, stateDir, batchId)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = batch
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"), max(col("event_id")).as("last_event"))
      .withColumn("max_sid", max(col("sid")).over(Window.partitionBy(col("user_id"))))
      .persist()
    try {
      val o = open.select(
        col("user_id"),
        col("start_ts").as("o_start"), col("last_ts").as("o_last"),
        col("n_events").as("o_n"),
        col("first_event").as("o_first"), col("last_event").as("o_last_ev"))
      // head session per user, possibly merged into the open session
      val merged = sess.join(o, Seq("user_id"), "left")
        .withColumn("merge_head",
          col("sid") === 1L && col("o_last").isNotNull &&
            unix_timestamp(col("start_ts")) - unix_timestamp(col("o_last")) <= gapSec)
        .select(col("user_id"), col("sid"), col("max_sid"), col("merge_head"),
          when(col("merge_head"), col("o_start")).otherwise(col("start_ts")).as("start_ts"),
          col("last_ts"),
          when(col("merge_head"), col("o_n") + col("n_events"))
            .otherwise(col("n_events")).as("n_events"),
          when(col("merge_head"), least(col("o_first"), col("first_event")))
            .otherwise(col("first_event")).as("first_event"),
          when(col("merge_head"), greatest(col("o_last_ev"), col("last_event")))
            .otherwise(col("last_event")).as("last_event"))
        .persist()
      try {
        val batchUsers = sess.select(col("user_id")).distinct()
        // open sessions that did NOT merge with their user's head close as-is
        val unmergedOpen = open.join(
          merged.filter(col("sid") === 1L && !col("merge_head"))
            .select(col("user_id")), Seq("user_id"), "semi")
        // horizon eviction: untouched users whose session cannot extend
        val minTs = batch.agg(min(col("ts"))).collect()(0).getTimestamp(0)
        val untouched = open.join(batchUsers, Seq("user_id"), "anti").persist()
        val (evicted, kept) =
          if (minTs == null) (emptyOpen(spark), untouched)
          else (untouched.filter(
            unix_timestamp(col("last_ts")) + gapSec < lit(minTs.getTime / 1000L)),
            untouched.filter(
              unix_timestamp(col("last_ts")) + gapSec >= lit(minTs.getTime / 1000L)))
        try {
          val proj = openCols.map(graft.ColNames.q)
          merged.filter(col("sid") < col("max_sid")).select(proj: _*)
            .unionByName(unmergedOpen.select(proj: _*))
            .unionByName(evicted.select(proj: _*))
            .write.mode("overwrite").parquet(s"$stateDir/closed/b$batchId")
          merged.filter(col("sid") === col("max_sid")).select(proj: _*)
            .unionByName(kept.select(proj: _*))
            .write.mode("overwrite").parquet(s"$stateDir/open/v$batchId")
        } finally { untouched.unpersist(); () }
      } finally { merged.unpersist(); () }
    } finally { sess.unpersist(); () }
  }

  /** All sessions — the closed log plus whatever is still open — numbered
    * per user in start order: w3's exact output shape. `distinct` absorbs
    * nothing in a clean run (sessions are disjoint per user) and exists
    * only as belt-and-braces against a partially-committed crash replay. */
  def sessions(spark: SparkSession, stateDir: String, throughBatchId: Long): DataFrame = {
    val deltas = listDirs(spark, s"$stateDir/closed", "b")
      .map(b => s"$stateDir/closed/b$b")
    val closed =
      if (deltas.isEmpty) emptyOpen(spark)
      else spark.read.parquet(deltas: _*)
    val all = closed.unionByName(openState(spark, stateDir, throughBatchId + 1)).distinct()
    all
      .withColumn("session_id", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("start_ts"))).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("first_event"), col("last_event"))
  }

  /** Wire a streaming (user_id, event_id, ts) frame into per-batch
    * [[absorb]] calls. */
  def start(
      events: DataFrame, stateDir: String, ckptDir: String,
      gapSec: Long = 1800L): StreamingQuery =
    events.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        absorb(batch.sparkSession, batch, stateDir, id, gapSec)
      }
      .start()
}
