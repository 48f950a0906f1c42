package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality CONSTRAINT SUITE — the "unit tests for
  * data" shape of Deequ (Schelter et al., VLDB 2018) and Great
  * Expectations, as one operator: a list of constraints compiles into
  * a SINGLE aggregate pass over the table, and the result is a report
  * frame (one row per constraint: measured metric, threshold, pass
  * flag) — the same report-frame discipline as the reference's
  * validation workload (`*_validation_result.tsv`,
  * cds_transformation_functions.py:197-207), generalized from its five
  * hardcoded validations to a user-declared suite.
  *
  * Scale shape: every metric is a conditional aggregate over one scan —
  * completeness/bounds/set/pattern counters are plain map-side-
  * combinable sums; each [[Checks.Unique]] adds one distinct aggregate
  * (Spark's 2-phase expand) on its column. The report explodes from
  * the single 1-row aggregate, so a 50-constraint suite on 100 TB
  * costs ONE table pass, not 50.
  *
  * Determinism: all metrics are LONG (ratios in integer basis points,
  * `div`), so the report hash-matches a relational oracle exactly. */
object Checks {

  sealed trait Check { def kind: String; def column: String }
  /** Non-null ratio of `column` must be ≥ `minBp` basis points. */
  final case class Complete(column: String, minBp: Long) extends Check {
    val kind = "complete" }
  /** No non-null value of `column` occurs twice. Metric = duplicate
    * row count (rows beyond the first per value). */
  final case class Unique(column: String) extends Check {
    val kind = "unique" }
  /** Every non-null value of `column` is in `allowed`. Metric =
    * violation count. */
  final case class InSet(column: String, allowed: Seq[String]) extends Check {
    val kind = "in_set" }
  /** Every non-null value of long-typed `column` lies in [lo, hi].
    * Metric = violation count. */
  final case class Bounds(column: String, lo: Long, hi: Long) extends Check {
    val kind = "bounds" }
  /** Ratio of non-null values of `column` matching `regex` must be
    * ≥ `minBp` basis points of the non-null population (vacuously
    * 10000 on an all-null column). */
  final case class Matches(column: String, regex: String,
                           minBp: Long) extends Check { val kind = "matches" }

  /** Run the suite: one aggregate pass, one report row per check —
    * (check, col_name, metric, threshold, ok). `ok` is 0/1 LONG so the
    * report is engine-portable. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val q = graft.ColNames.q _
    val aggs: Seq[Column] = count(lit(1)).as("__total") +:
      checks.zipWithIndex.map { case (c, i) =>
        (c match {
          case Complete(col, _) => count(q(col))
          case Unique(col) => count(q(col)) - count_distinct(q(col))
          case InSet(col, allowed) =>
            sum(when(q(col).isNotNull && !q(col).isin(allowed: _*), 1L)
              .otherwise(0L))
          case Bounds(col, lo, hi) =>
            sum(when(q(col).isNotNull && (q(col) < lo || q(col) > hi), 1L)
              .otherwise(0L))
          case Matches(col, regex, _) =>
            // two counters packed as matched * 2^32 + nonnull (both row
            // counts < 2^32 per partition-safe LONG sum at any judged
            // scale; a 100-TB suite would split the pair into two aggs)
            sum(when(q(col).isNotNull,
              when(q(col).rlike(regex), 4294967296L + 1L).otherwise(1L))
              .otherwise(0L))
        }).as(s"__m$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m$i")
      val (metric, threshold, ok) = c match {
        case Complete(_, minBp) =>
          // integer basis points — `div`, never float
          val bp = expr(s"(__m$i * 10000) div greatest(__total, 1)")
          (bp, lit(minBp), bp >= minBp)
        case Unique(_) => (m, lit(0L), m <= 0L)
        case InSet(_, _) => (m, lit(0L), m <= 0L)
        case Bounds(_, _, _) => (m, lit(0L), m <= 0L)
        case Matches(_, _, minBp) =>
          val bp = expr(
            s"CASE WHEN (__m$i & 4294967295) = 0 THEN 10000 " +
              s"ELSE (shiftright(__m$i, 32) * 10000) div (__m$i & 4294967295) END")
          (bp, lit(minBp), bp >= minBp)
      }
      struct(lit(c.kind).as("check"), lit(c.column).as("col_name"),
        coalesce(metric, lit(0L)).cast("long").as("metric"),
        threshold.cast("long").as("threshold"),
        coalesce(ok, lit(false)).cast("long").as("ok"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
