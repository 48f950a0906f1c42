package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-profiling summary — the data-quality reconnaissance step that
  * precedes every mapping/validation decision the reference encodes by
  * hand (its dict bootstrap inspects column names only,
  * `cds-transformation_v1.3.py:35-51`; a profile of the VALUES is what a
  * curator actually reads before writing the mapping YAML, and what a
  * training-data pipeline logs per ingest batch).
  *
  * One row per input column: total rows, null count, distinct count, and
  * min/max rendered to strings by a caller-supplied per-column renderer
  * (typed min/max FIRST, formatting after — so a fixed-format render
  * never perturbs which value wins).
  *
  * Shape at scale: ONE global aggregate over a single scan — no join, no
  * window; the per-column stat row fan-out happens on the 1-row result.
  * The one scale-relevant choice is distinct counting:
  *
  *  - `exactDistinct = true`: `count(DISTINCT c)` per column. Spark plans
  *    N distinct aggregates via Expand — the input multiplies ×(N+1)
  *    map-side before one shuffle. Exact, and the shape the DuckDB
  *    oracle can hash-match; the ×(N+1) is the disclosed cost.
  *  - `exactDistinct = false`: `approx_count_distinct` (HLL++, the w9
  *    sketch) — single-pass partial aggregate, NO Expand, constant
  *    memory per column. The 100 TB default; same query shape otherwise
  *    (gated by the plan spec, not the value oracle).
  */
object Profile {

  /** Render typed min/max to a portable string. Defaults: plain cast.
    * Supply `render` entries for types whose cast rendering is not
    * engine-portable (doubles → `format_string("%.2f", _)`, timestamps →
    * `date_format(_, "yyyy-MM-dd HH:mm:ss")`). */
  def profile(df: DataFrame,
              render: Map[String, Column => Column] = Map.empty,
              exactDistinct: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    def rendered(c: String, agg: Column): Column =
      render.getOrElse(c, (x: Column) => x.cast("string"))(agg)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__nd"),
        rendered(c, min(col(c))).as(s"${c}__mn"),
        rendered(c, max(col(c))).as(s"${c}__mx"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_str"),
        col(s"${c}__mx").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_str"), col("p.max_str"))
  }

  /** Statistics-drift report between two ingest batches of the same table
    * — the check a recurring pipeline runs before promoting a new batch
    * (null-rate spikes, category-set changes, range shifts; the drift
    * twin of the reference's per-batch validation reports).
    *
    * `isNew` labels each row's batch. ONE conditional aggregate over ONE
    * scan computes both sides' profiles (count/distinct/min/max under
    * `when(isNew, c)` / `when(!isNew, c)` — never a self-join of two
    * profile passes, which would scan twice); the per-column comparison
    * rows fan out from the single result row. Exact distinct doubles the
    * Expand width to ×(2N+1) — same disclosed cost as [[profile]], same
    * `exactDistinct = false` HLL++ escape at 100 TB. */
  def drift(df: DataFrame, isNew: Column,
            render: Map[String, Column => Column] = Map.empty,
            exactDistinct: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "cannot drift-check a zero-column frame")
    def side(c: String, newSide: Boolean): Column =
      when(if (newSide) isNew else !isNew, col(c))
    def nd(x: Column): Column =
      if (exactDistinct) countDistinct(x) else approx_count_distinct(x)
    def rendered(c: String, agg: Column): Column =
      render.getOrElse(c, (x: Column) => x.cast("string"))(agg)
    val aggs = cols.flatMap { c =>
      Seq(
        count(side(c, newSide = false)).as(s"${c}__nn_o"),
        count(side(c, newSide = true)).as(s"${c}__nn_n"),
        nd(side(c, newSide = false)).as(s"${c}__nd_o"),
        nd(side(c, newSide = true)).as(s"${c}__nd_n"),
        rendered(c, min(side(c, newSide = false))).as(s"${c}__mn_o"),
        rendered(c, min(side(c, newSide = true))).as(s"${c}__mn_n"),
        rendered(c, max(side(c, newSide = false))).as(s"${c}__mx_o"),
        rendered(c, max(side(c, newSide = true))).as(s"${c}__mx_n"))
    }
    val one = df.agg(
      count(when(!isNew, lit(1))).as("__rows_o"),
      (count(when(isNew, lit(1))).as("__rows_n") +: aggs): _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows_o").as("n_old"),
        col("__rows_n").as("n_new"),
        (col("__rows_o") - col(s"${c}__nn_o")).as("nulls_old"),
        (col("__rows_n") - col(s"${c}__nn_n")).as("nulls_new"),
        col(s"${c}__nd_o").as("distinct_old"),
        col(s"${c}__nd_n").as("distinct_new"),
        coalesce(col(s"${c}__mn_o") === col(s"${c}__mn_n"), lit(false))
          .cast("int").as("min_same"),
        coalesce(col(s"${c}__mx_o") === col(s"${c}__mx_n"), lit(false))
          .cast("int").as("max_same"))
    }
    one.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_old"), col("p.n_new"),
        col("p.nulls_old"), col("p.nulls_new"),
        col("p.distinct_old"), col("p.distinct_new"),
        col("p.min_same"), col("p.max_same"))
  }

  /** Equi-width histogram of a long-valued column — the distribution view
    * that [[profile]]'s min/max row cannot give (where DID the mass go).
    *
    * The column must already be exact-integer-valued (cast money to cents
    * first): bucket assignment is pure INTEGER arithmetic,
    * `((v - lo) * nBuckets) div (hi - lo + 1)` — no float division, so
    * engine ulp behavior can never move a boundary value into the wrong
    * bucket (the portable-histogram discipline; a double `(v-lo)/width`
    * floors differently across engines at exact multiples).
    *
    * Shape at scale: one min/max aggregate (two scalars to the driver —
    * bounded state, broadcast back as literals), then ONE groupBy over at
    * most `nBuckets` groups, map-side combinable. Nulls are excluded (the
    * null count is [[profile]]'s job). Empty input returns an empty frame
    * rather than a degenerate single bucket. */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "histogram: nBuckets must be positive")
    val v = df.select(col(valueCol).cast("long").as("v")).filter(col("v").isNotNull)
    val mm = v.agg(min(col("v")), max(col("v"))).head()
    if (mm.isNullAt(0))
      return v.select(lit(0L).as("bucket"), lit(0L).as("n_rows"),
        lit(0L).as("min_v"), lit(0L).as("max_v")).limit(0)
    val lo = mm.getLong(0)
    val span = mm.getLong(1) - lo + 1L
    require(span <= Long.MaxValue / nBuckets,
      s"histogram: range $span x $nBuckets buckets overflows long arithmetic")
    v.select(
        expr(s"((v - ${lo}L) * ${nBuckets}L) div ${span}L").as("bucket"),
        col("v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }
}
