package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Ids

/** v1.2-equivalent multi-sheet wiring (SURVEY.md §3.3,
  * cds-transformation_v1.2.py:92-200): typed sheets arrive as separate
  * frames and FK columns are wired explicitly —
  *
  *  - J3 lookup join, FIRST match, with the reference's all-or-nothing
  *    rule (`:168-194`): the joined column is kept only when EVERY row
  *    found a match; one miss and the whole column is dropped.
  *  - J4 broadcast scalar (`:161-166`): when the Study sheet has exactly
  *    one row with a non-null key, replicate it onto every child row.
  *  - P10 id fallback (`:66-73`): missing file ids are synthesized — the
  *    reference draws random ints; we derive a deterministic sha2
  *    surrogate from the natural columns (SURVEY.md §7.4 risk 4).
  *
  * Spark shapes: J3 = aggregate-then-broadcast-join (`min_by` for a
  * deterministic "first"), never a per-row scan; the all-or-nothing probe
  * is one small count aggregate. J4 = driver `collect()` of a 1-row frame
  * into a literal. All decisions that gate SCHEMA (keep/drop a column)
  * are driver-side by necessity, same as the reference.
  */
object MultiSheet {

  /** J3: `child` gains `outCol` = first `valueCol` from `mapping` matching
    * on `key` (first = minimal `orderCol`, deterministic). Returns the
    * child UNCHANGED when any child row would miss (all-or-nothing). */
  def lookupFirstMatch(
      child: DataFrame, key: String,
      mapping: DataFrame, valueCol: String, orderCol: String,
      outCol: String): DataFrame = {
    val firsts = mapping
      .filter(graft.ColNames.q(key).isNotNull && graft.ColNames.q(valueCol).isNotNull)
      .groupBy(graft.ColNames.q(key))
      .agg(min_by(graft.ColNames.q(valueCol), graft.ColNames.q(orderCol)).as(outCol))
    val joined = child.join(broadcast(firsts), Seq(key), "left")
    val misses = joined.filter(graft.ColNames.q(outCol).isNull).limit(1).count()
    if (misses > 0) child else joined
  }

  /** J4: replicate the single parent row's `keyCol` onto every child row
    * as `outCol`; no-op when the parent isn't exactly one non-null row. */
  def broadcastScalar(
      child: DataFrame, parent: DataFrame, keyCol: String, outCol: String): DataFrame = {
    val rows = parent.select(graft.ColNames.q(keyCol)).limit(2).collect()
    rows match {
      case Array(r) if !r.isNullAt(0) =>
        child.withColumn(outCol, lit(r.get(0)))
      case _ => child
    }
  }

  /** P10: fill a missing-or-null id column with a deterministic surrogate
    * derived from `naturalCols`. Adds the column when absent. */
  def ensureId(df: DataFrame, idCol: String, naturalCols: Seq[String]): DataFrame = {
    val surrogate = Ids.deterministicId(naturalCols.map(graft.ColNames.q))
    if (!df.columns.contains(idCol)) df.withColumn(idCol, surrogate)
    else df.withColumn(idCol, coalesce(graft.ColNames.q(idCol), surrogate))
  }
}
