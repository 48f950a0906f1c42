package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MATERIALIZED-VIEW maintenance over snapshot tables
  * (round-16): keep a grouped COUNT/SUM aggregate of a source table
  * fresh by consuming the source's CDC interval
  * ([[Snapshots.changesBetween]]) instead of rescanning it — the
  * self-maintainable-view algebra every warehouse implements (Gupta &
  * Mumick's classic taxonomy: COUNT and SUM are distributive over
  * insert/delete deltas, so the view is maintainable from the delta
  * alone; MIN/MAX are NOT self-maintainable under deletes and are
  * deliberately out of scope).
  *
  * The maintenance state is the MV's OWN snapshot table:
  *  - view rows live under `mvDir` (one row per group: the group key,
  *    `cnt`, and one `sum_<col>` per summed column — integer columns
  *    only, so the refresh algebra and the oracle are float-free);
  *  - the refresh WATERMARK (the last source snapshot folded in) rides
  *    the MV commit's idempotence TAG (`mv-refresh-<srcId>`), so
  *    refresh-once semantics and crash recovery are the snapshot
  *    format's existing guarantees, not new machinery. A refresh that
  *    finds no new source snapshot is a no-op.
  *
  * Scale shape — the reason this exists: each refresh costs the CDC
  * interval (append-only source intervals touch ONLY the new dirs —
  * changesBetween's contract) + one group-keyed MERGE into the
  * group-cardinality-sized MV. A 100 TB fact table with daily appends
  * refreshes its daily rollup for the price of one day, never the
  * table. Deletes/merges in the interval add changesBetween's one
  * pruned rehydration pass of the from-state — still never a two-sided
  * recompute of the view.
  *
  * Group keys must be non-null (they ride the MV table's equality
  * delete key): coalesce upstream if the source column is nullable. */
object MaterializedView {

  private val TagPrefix = "mv-refresh-"

  /** The last source snapshot id folded into the MV (0 = never
    * refreshed): the max `mv-refresh-<id>` tag on the MV's retained
    * chain. */
  def lastRefreshedSrcId(spark: SparkSession, mvDir: String): Long = {
    var cur = Snapshots.current(spark, mvDir)
    var best = 0L
    while (cur.isDefined) {
      cur.get.tag.filter(_.startsWith(TagPrefix))
        .flatMap(_.stripPrefix(TagPrefix).toLongOption)
        .foreach(i => best = math.max(best, i))
      cur = cur.get.parent.flatMap(Snapshots.get(spark, mvDir, _))
    }
    best
  }

  /** Refresh the MV at `mvDir` to the source's current snapshot:
    * aggregate the CDC interval (inserts +1/+value, deletes −1/−value),
    * merge the group deltas into the view, delete groups whose count
    * reaches zero. Returns the MV snapshot id now current (unchanged if
    * the source hasn't moved). The view row for group g is always
    * exactly `(g, count(*), sum(col)…)` over the source's CURRENT
    * visible rows — Spec-pinned equal to a full recompute. */
  def refresh(spark: SparkSession, srcDir: String, mvDir: String,
              groupCol: String, sumCols: Seq[String]): Long = {
    val srcId = Snapshots.current(spark, srcDir).getOrElse(
      sys.error(s"MV refresh from empty source table $srcDir")).id
    val fromId = lastRefreshedSrcId(spark, mvDir)
    if (fromId == srcId)
      return Snapshots.current(spark, mvDir).get.id
    require(fromId < srcId,
      s"MV at $mvDir is ahead of its source ($fromId > $srcId): " +
        "wrong source dir, or the source table was rebuilt from scratch")
    val tag = Some(s"$TagPrefix$srcId")
    val delta = Snapshots.changesBetween(spark, srcDir, fromId, srcId)
    val sign = when(col("op") === "I", lit(1L)).otherwise(lit(-1L))
    val deltaAgg = delta.groupBy(col(groupCol)).agg(
      sum(sign).as("d_cnt"),
      sumCols.map(c => sum(sign * col(c).cast("long")).as(s"d_sum_$c")): _*)
    val mvCur = Snapshots.current(spark, mvDir)
    if (mvCur.isEmpty) {
      // bootstrap: the first interval IS the full state (fromId = 0
      // reads the whole source as inserts); drop never-positive groups
      // (a key inserted and deleted inside one interval)
      val first = deltaAgg.filter(col("d_cnt") > 0).select(
        col(groupCol) +: col("d_cnt").as("cnt") +:
          sumCols.map(c => col(s"d_sum_$c").as(s"sum_$c")): _*)
      return Snapshots.commitAppend(first, mvDir, tag)
    }
    // merged view state for ONLY the groups the delta touches (a LEFT
    // join from the delta: untouched groups never enter the merge, so
    // a refresh writes O(|touched groups|), not O(|view|) — the merge's
    // sequence rule keeps the rest of the view as-is).
    // CACHED for the commit (round-20, guide §5): the commit consumes
    // this frame three times (the merge's delete-key union reads
    // upserts AND gone, the data dir reads upserts again), and each
    // consumption used to re-run the whole CDC-interval aggregate +
    // view join. The frame is touched-group-sized — tiny.
    val touched = deltaAgg
      .join(Snapshots.read(spark, mvDir), Seq(groupCol), "left")
      .select(
        col(groupCol) +:
          (coalesce(col("cnt"), lit(0L)) + col("d_cnt")).as("cnt") +:
          sumCols.map(c =>
            (coalesce(col(s"sum_$c"), lit(0L)) +
              col(s"d_sum_$c")).as(s"sum_$c")): _*)
      .persist()
    try {
      val upserts = touched.filter(col("cnt") > 0)
      val gone = touched.filter(col("cnt") <= 0).select(groupCol)
      Snapshots.commitMergeKeyed(upserts, gone, mvDir, groupCol, tag)
    } finally {
      touched.unpersist()
      ()
    }
  }
}
