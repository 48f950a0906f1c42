package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S3 — transposed key/value sheet scan (`cds-transformation.py:108-120`):
  * the v1 `Study` sheet stores one record as (key, value) ROWS; the
  * reference transposes it into a single wide row and replicates it per
  * manifest row.
  *
  * Spark shape: `groupBy().pivot(keys).agg(first(value))` — the pivot key
  * list is explicit (static schema; Spark would otherwise need an extra
  * distinct-scan job to discover it), and replication onto a fact frame is
  * the J4 broadcast cross join, not a data copy.
  */
object Reshape {

  /** Pivot a (key, value) frame into one wide row. `keys` fixes the output
    * columns (missing keys → null column, extra rows ignored). */
  def transposedKv(
      df: DataFrame, keyCol: String, valueCol: String, keys: Seq[String]): DataFrame =
    df.groupBy()
      .pivot(keyCol, keys)
      .agg(first(graft.ColNames.q(valueCol), ignoreNulls = true))

  /** Wide→long unpivot (melt) — the inverse of the S3/p12 pivots: each
    * input row becomes one row per value column, `(ids…, varName, valName)`.
    * Value columns are cast to a common type by Spark's native `unpivot`
    * (caller casts explicitly when mixing int/double to keep the least
    * common type predictable).
    *
    * Scale shape: `Expand` — a narrow, shuffle-free operator (each input
    * row emits its |values| output rows in place), so it streams at scan
    * speed and preserves the input partitioning; nothing to re-plan at
    * 100 TB. */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
           varName: String = "attr", valName: String = "val"): DataFrame =
    df.unpivot(
      ids.map(graft.ColNames.q).toArray,
      values.map(graft.ColNames.q).toArray,
      varName, valName)
}
