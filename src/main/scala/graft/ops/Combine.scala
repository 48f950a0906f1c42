package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Group-merge and column-synthesis operators (SURVEY.md §2.4 A2, §2.3 J7).
  *
  * A2 — combine_rows (`cds_transformation_functions.py:125-160`): for
  * configured nodes, group rows by the node id; per column, take the
  * distinct non-null values, sort them, and join with ", " — skipping any
  * value already substring-contained in the accumulated string; a single
  * value passes through; none → null.
  *
  * Spark shape: one `groupBy(id).agg(collect_set…)` — HashAggregate with
  * map-side partials, so the shuffle carries one row per (id, distinct
  * value set), not per input row. The substring-suppression fold runs as an
  * `aggregate()` higher-order function over the already-collected sorted
  * array — per-group, driver-free, codegen-eligible.
  *
  * J7 — combine_columns (`cds_transformation_functions.py:362-400`): a
  * synthesized compound id `a + "_" + b` where numeric-looking values print
  * integer-style ("25.0" → "25"). The reference matches operands *by row
  * position across node frames*; since all frames were sliced from the same
  * wide Metadata row, the Spark-first design computes the compound column on
  * the wide frame *before* splitting into nodes — same semantics, zero
  * shuffle (SURVEY.md §7.4 risk 1).
  */
object Combine {

  /** A2: fold a sorted array of distinct strings into a ", "-joined string,
    * skipping values already substring-contained in the accumulator. Values
    * are trimmed first (the reference strip()s each value,
    * cds_transformation_functions.py:145). */
  def foldDistinctSorted(c: Column): Column = {
    val sorted = sort_array(collect_set(trim(c.cast(StringType))))
    val folded = aggregate(
      sorted,
      lit(""),
      (acc, v) =>
        when(length(acc) === 0, v)
          .when(acc.contains(v), acc)
          .otherwise(concat(acc, lit(", "), v)))
    when(length(folded) === 0, lit(null).cast(StringType)).otherwise(folded)
  }

  /** A2: group-merge `df` by `id`; every column in `cols` becomes its
    * folded distinct-value string. */
  def combineRows(df: DataFrame, id: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => foldDistinctSorted(graft.ColNames.q(c)).as(c))
    df.groupBy(graft.ColNames.q(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** J7: compound column from parts with lossless numeric formatting,
    * joined by `sep` ("_" in the reference config,
    * cds_config_example_v1.3.yaml:75-99). */
  def combineColumns(parts: Seq[Column], sep: String = "_"): Column =
    concat_ws(sep, parts.map(Normalize.losslessNumFmt): _*)
}
