package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling — regularize an irregular event stream onto a
  * fixed grid per key and forward-fill the gaps: the prep step for any
  * rate/trend model that assumes evenly spaced observations (the
  * reference's closest shape is nothing — pandas users reach for
  * `df.resample().ffill()`; this is that, distributed).
  */
object Resample {

  /** Per-key fixed-interval grid + last-observation-carried-forward.
    *
    * Steps (all keyed on `keyCol` — no global state):
    *   1. bucket events to the grid (`date_trunc(unit)`) and reduce each
    *      bucket with `max` (deterministic, order-free);
    *   2. derive each key's [min,max] bucket from THAT hourly frame (the
    *      grid bounds come from the already-aggregated small frame, never
    *      a second scan of the raw stream) and explode its `sequence` —
    *      grid rows = keys x buckets-in-range, the output's own size;
    *   3. left-join observed buckets onto the grid (keyed equi-join) and
    *      forward-fill with `last(ignoreNulls)` over a keyed window.
    *
    * Shuffles: the bucket aggregate over the raw stream is the only
    * stream-sized exchange; everything after operates on grid-sized
    * frames. A key's window partition is bounded by its own time span,
    * not the corpus. Leading gaps (before a key's first observation)
    * cannot exist by construction — the grid starts at the key's first
    * bucket.
    *
    * @param unit  `date_trunc` unit for the grid ("hour", "day", …)
    * @param step  grid stride as a SQL interval literal ("1 hour" — must
    *              match `unit`'s granularity or buckets fall between grid
    *              points)
    * @return (keyCol, bucket_ts, value, was_gap) — `value` forward-filled,
    *         `was_gap` 1 where no event landed in the bucket
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, unit: String = "hour",
              step: String = "1 hour"): DataFrame = {
    val observed = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket_ts"))
      .agg(max(col(valueCol)).as("_v"))
    val bounds = observed.groupBy(col(keyCol))
      .agg(min(col("bucket_ts")).as("_lo"), max(col("bucket_ts")).as("_hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("_lo"), col("_hi"),
        expr(s"INTERVAL $step"))).as("bucket_ts"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(keyCol, "bucket_ts"), "left")
      .select(col(keyCol), col("bucket_ts"),
        last(col("_v"), ignoreNulls = true).over(w).as("value"),
        col("_v").isNull.cast("int").as("was_gap"))
  }
}
