package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level dedup / pruning operators (SURVEY.md §2.4 A1, §2.2 P7).
  *
  * A1 — stringified exact dedup (`cds-transformation_v1.3.py:147-152`):
  * the reference dedups on the *string rendering* of every column
  * (`astype(str).drop_duplicates()`), so `1` and `1.0` stay distinct only
  * when their renderings differ. We reproduce that by keying on a
  * `concat_ws`-joined cast-to-string projection.
  *
  * Scale: `dropDuplicates` compiles to a HashAggregate with map-side
  * partial dedup — each executor removes its local duplicates before the
  * exchange, so the shuffle carries only distinct keys. At 100 TB this is
  * the right plan; no custom work needed.
  */
object Dedup {

  private val Sep = "\u0001"
  private val NullToken = "\u0000<null>"

  /** A1: dedup on the string rendering of all (or the given) columns.
    * Nulls are tokenized so (null,"a") ≠ ("a",null) ≠ ("a","a").
    *
    * Retention is deterministic: when `cols` is a strict subset of the
    * frame's columns, the surviving row per key is the one minimal under the
    * full-row string rendering (dropDuplicates alone keeps an arbitrary row,
    * which varies across retries/partitionings — unacceptable for an engine
    * whose oracle hash-compares values). Keying on all columns needs no
    * tie-break: duplicate rows are interchangeable. */
  def stringified(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    def rowKey(cs: Seq[String]) =
      concat_ws(Sep, cs.map(c => coalesce(graft.ColNames.q(c).cast("string"), lit(NullToken))): _*)
    val keyCols = if (cols.isEmpty) df.columns.toSeq else cols
    if (keyCols.toSet == df.columns.toSet) {
      df.withColumn("__dedup_key", rowKey(keyCols))
        .dropDuplicates("__dedup_key").drop("__dedup_key")
    } else {
      // min-by(full row rendering) per key: one hash aggregate, same
      // shuffle shape as dropDuplicates, but replay-stable.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(rowKey(keyCols)).orderBy(rowKey(df.columns.toSeq))
      df.withColumn("__dedup_rn", row_number().over(w))
        .filter(col("__dedup_rn") === 1).drop("__dedup_rn")
    }
  }

  /** P7: drop rows where *every* column in `subset` is null
    * (`dropna(subset=original_props, how='all')`,
    * cds-transformation_v1.3.py:153-159). */
  def dropAllNullRows(df: DataFrame, subset: Seq[String]): DataFrame =
    df.na.drop("all", subset)
}
