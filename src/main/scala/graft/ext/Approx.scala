package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB profiling toolkit (SURVEY.md §2.8
  * notes the reference has none; these are the engine's scale extensions
  * for corpus/telemetry profiling where exact distinct/quantiles would
  * shuffle the world).
  *
  * All are single-pass, mergeable sketches (HLL++, GK quantiles, CMS):
  * map-side partials keep the shuffle at sketch size — constant per
  * partition — instead of cardinality size. That difference is the whole
  * game at 100 TB: `approx_count_distinct` on a 10¹¹-row key column moves
  * a few KB per partition where `count(distinct)` would shuffle every
  * distinct value.
  */
object Approx {

  /** HLL++ distinct count, default 5% relative sd. */
  def distinctCount(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** GK-sketch quantiles at the given probabilities. */
  def quantiles(c: Column, probs: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c, array(probs.map(lit): _*), lit(accuracy))

  /** Sketch-accuracy gate: per group, the HLL++ distinct estimate must sit
    * within `maxErrPct` of the exact distinct count. Emits
    * `(grp, n_exact, approx_ok)` — the oracle recomputes `n_exact` and
    * expects `approx_ok = 1`, so a sketch regression (precision misconfig,
    * merge bug) flips the flag and fails the hash gate. The exact side is
    * affordable here because it IS the verifier; production profiling uses
    * the sketch alone. */
  def distinctGate(df: DataFrame, grp: String, c: String,
                   rsd: Double = 0.02, maxErrPct: Double = 5.0): DataFrame =
    df.groupBy(graft.ColNames.q(grp))
      .agg(
        count_distinct(graft.ColNames.q(c)).as("n_exact"),
        approx_count_distinct(graft.ColNames.q(c), rsd).as("__approx"))
      .select(graft.ColNames.q(grp), col("n_exact"),
        when(abs(col("__approx") - col("n_exact")) * lit(100.0)
          <= col("n_exact") * lit(maxErrPct), lit(1L)).otherwise(lit(0L))
          .as("approx_ok"))

  /** Quantile-sketch accuracy gate: per group, each GK-sketch percentile
    * must land inside the EXACT value interval
    * `[percentile(p − rankTol), percentile(p + rankTol)]` — the
    * value-space image of its rank-error guarantee (1/accuracy, here
    * 100× tighter than `rankTol`). Emits `(grp, n_rows, pctl_ok)`; the
    * oracle recomputes `n_rows` and expects the constant flag.
    *
    * The comparison is only meaningful when the ±rankTol band spans at
    * least a couple of elements — the sketch returns a DISCRETE data
    * value while the exact bounds interpolate, so for groups with fewer
    * than `2/rankTol` non-null values (or none at all) the flag passes
    * vacuously rather than failing on interpolation wobble. All exact
    * bounds ride ONE percentile aggregate (a single per-group buffer,
    * not two per prob). */
  def quantileGate(df: DataFrame, grp: String, c: String,
                   probs: Seq[Double] = Seq(0.5, 0.9),
                   accuracy: Int = 10000,
                   rankTol: Double = 0.01): DataFrame = {
    require(probs.nonEmpty, "quantileGate: probs must be non-empty")
    require(rankTol > 0, "quantileGate: rankTol must be positive")
    require(probs.forall(p => p - rankTol >= 0 && p + rankTol <= 1),
      s"quantileGate: every prob must sit in [$rankTol, ${1 - rankTol}] " +
        "so the rank-tolerance band stays inside [0, 1]")
    val v = graft.ColNames.q(c)
    val boundProbs = probs.flatMap(p => Seq(p - rankTol, p + rankTol))
    val aggs = probs.zipWithIndex.map { case (p, i) =>
      percentile_approx(v, lit(p), lit(accuracy)).as(s"__a$i")
    } ++ Seq(
      percentile(v, array(boundProbs.map(lit): _*)).as("__bounds"),
      count(v).as("__nv"))
    val inBand = probs.indices.map { i =>
      col(s"__a$i").between(
        element_at(col("__bounds"), 2 * i + 1),
        element_at(col("__bounds"), 2 * i + 2))
    }.reduce(_ && _)
    val vacuous = col("__nv") < lit(math.ceil(2 / rankTol).toLong)
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    df.groupBy(graft.ColNames.q(grp))
      .agg(allAggs.head, allAggs.tail: _*)
      .select(graft.ColNames.q(grp), col("n_rows"),
        when(vacuous || inBand, lit(1L)).otherwise(lit(0L)).as("pctl_ok"))
  }

  /** Per-key cardinality profile of a frame: one row per column with
    * approximate distinct count and null count — the scan-once corpus
    * profile (every sketch rides the same pass). */
  def cardinalityProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cardinalityProfile: cols must name at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        approx_count_distinct(graft.ColNames.q(c)).as(s"${c}__approx_distinct"),
        count(when(graft.ColNames.q(c).isNull, lit(1))).as(s"${c}__nulls"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to (column, approx_distinct, nulls)
    val spark = df.sparkSession
    import spark.implicits._
    val wide = row.collect()(0)
    cols.map { c =>
      (c, wide.getAs[Long](s"${c}__approx_distinct"), wide.getAs[Long](s"${c}__nulls"))
    }.toDF("column", "approx_distinct", "nulls")
  }
}
