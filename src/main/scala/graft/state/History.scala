package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** H1/H2 — cross-run historical state (`cds_transformation_functions.py:420-466`).
  *
  * The reference keeps per-study value histories in YAML files it
  * read-modify-writes each run (no concurrency story, SURVEY.md §7.4
  * risk 5). Our engine models history as a parquet state table
  * `history(key string, values array<string>)` merged with set semantics:
  * new values are appended (`array_union` ≙ the reference's
  * `set(new) - set(known)` + append, `:440-443`) and the list is kept
  * sorted descending (`sort(reverse=True)`, `:443`).
  *
  * Merge is a single full-outer join keyed on `key`; history tables are
  * per-study-small, so the join broadcasts. Write discipline is
  * single-writer overwrite (the Spark equivalent of the reference's
  * whole-file rewrite).
  */
object History {

  /** Merge incoming `updates(key, values)` into `state(key, values)`. */
  def merge(state: DataFrame, updates: DataFrame): DataFrame = {
    val s = state.select(col("key"), col("values").as("old_values"))
    val u = updates.select(col("key"), col("values").as("new_values"))
    s.join(u, Seq("key"), "full_outer")
      .select(
        col("key"),
        reverse(sort_array(array_distinct(concat(
          coalesce(col("old_values"), array()),
          coalesce(col("new_values"), array()))))).as("values"))
  }

  /** H1 ingestion shape: take a node frame's (key, comma-joined list value)
    * and split/trim into update rows (`split(',')` + strip, `:428`).
    *
    * `strict` (default, mirroring the reference): a NULL historical value
    * aborts the run (`cds_transformation_functions.py:423-425` hard-exits
    * via `sys.exit(1)` — a null here means the upstream frame lost a
    * value, and silently merging it would corrupt the history state).
    * The guard is `raise_error` INSIDE the plan — no eager driver-side
    * probe; the job fails at execution wherever the null surfaces, which
    * is the distributed equivalent of the reference's abort. */
  def updatesFromColumn(df: DataFrame, key: String, listCol: String,
                        strict: Boolean = true): DataFrame = {
    val value =
      if (strict)
        when(col(listCol).isNull, raise_error(concat(
          lit(s"historical value is null in column '$listCol' for key "),
          coalesce(col(key).cast("string"), lit("<null>")))))
          .otherwise(col(listCol))
      else col(listCol)
    df.select(
      col(key).as("key"),
      transform(split(value, ","), v => trim(v)).as("values"))
  }

  /** H2: render history back onto a node frame as the full comma-joined
    * list — applied *before* the sink instead of the reference's
    * read-back-and-rewrite of emitted TSVs (SURVEY.md §2.6 H2). */
  def applyHistory(node: DataFrame, key: String, targetCol: String, state: DataFrame): DataFrame =
    node
      .join(broadcast(state.select(col("key").as(key), col("values"))), Seq(key), "left")
      .withColumn(targetCol,
        coalesce(array_join(col("values"), ","), col(targetCol)))
      .drop("values")

  /** H4 — last-writer-wins upsert (SCD type 1): merge an update stream
    * into a keyed base table, keeping per key the update with the highest
    * `(orderCols...)` and falling back to the base value when a key never
    * got an update. The reference's history files get this by whole-file
    * rewrite; the engine form is one map-side-combining `max(struct)`
    * aggregate over the updates (the exchange carries one row per updated
    * key, never the raw update stream) plus one join against the base —
    * AQE broadcasts it when the update keyset is small.
    *
    * `orderCols` must end in a per-key-unique tiebreak for determinism;
    * the update's `updValue` must be non-null (a null latest value would
    * silently fall back to the base — pair with
    * [[updatesFromColumn]]-style strict guards upstream if that matters).
    * Output: base columns + `current_value` (latest update value, else
    * `valueCol`) + `updated` (1/0 long).
    */
  def upsertLatest(base: DataFrame, key: String, valueCol: String,
                   updates: DataFrame, updKey: String, updValue: String,
                   orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "upsertLatest: orderCols must be non-empty")
    val picked = updates
      .groupBy(col(updKey).as(key))
      .agg(max(struct(orderCols.map(col) :+ col(updValue).as("_v"): _*)).as("_m"))
      .select(col(key), col("_m._v").as("_new"), lit(1L).as("_hit"))
    base.join(picked, Seq(key), "left")
      .withColumn("current_value", coalesce(col("_new"), col(valueCol)))
      // `updated` marks that an update row EXISTED for the key (join
      // match) — not that its value was non-null — matching the h4
      // oracle's `r.user_id IS NULL` test; a null winning value still
      // reports updated=1 with current_value falling back to the base
      .withColumn("updated", coalesce(col("_hit"), lit(0L)))
      .drop("_new", "_hit")
  }

  /** H5 — SCD type-2 validity intervals: turn a change-event stream into
    * per-key attribute versions with `[valid_from, valid_to)` ranges —
    * `valid_to` is the NEXT change's timestamp, null while current (the
    * warehouse-standard slowly-changing-dimension shape the reference's
    * whole-file history rewrite cannot express).
    *
    * Shape: ONE shuffle on the key and a per-key `lead` window — no
    * self-join, no state. `orderCols` (time first, then a per-key-unique
    * tiebreak) must be deterministic or equal-timestamp changes would
    * order differently across runs. Scales like any keyed window: skewed
    * keys are bounded by their own change counts, not the table size.
    */
  def scd2(changes: DataFrame, key: String, timeCol: String,
           tieBreak: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(timeCol), col(tieBreak))
    changes
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
  }

  /** H7 — snapshot diff (CDC derivation): classify every key of two
    * snapshot frames as `insert` (new only), `delete` (old only) or
    * `update` (both, any compared value differs); unchanged keys are
    * dropped. Emits the key columns, `op`, and `old_<c>` / `new_<c>` for
    * each compared column. The reference's closest shape is the A6
    * set-difference merge, which only sees values — this is the keyed,
    * typed form a warehouse needs to promote a recurring ingest.
    *
    * Shape: ONE shuffle. Both snapshots are unioned under a side tag and
    * grouped by key with conditional max-struct aggregates — at scale both
    * sides are large, so the full-outer join formulation (each side
    * shuffled, then joined) pays the same partitioning twice and adds a
    * join operator; the union form is map-side-combinable and never
    * materializes matched-unchanged pairs before the filter. Keys must be
    * unique per snapshot (a snapshot IS keyed state); value comparison is
    * null-safe (`<=>`).
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: Seq[String],
                   compare: Seq[String]): DataFrame = {
    require(key.nonEmpty && compare.nonEmpty, "snapshotDiff: key and compare required")
    val cols = (key ++ compare).map(col)
    val tagged = old.select(cols :+ lit(0).as("_side"): _*)
      .unionByName(neu.select(cols :+ lit(1).as("_side"): _*))
    val packed = struct(compare.map(col): _*)
    val grouped = tagged
      .groupBy(key.map(col): _*)
      .agg(
        max(when(col("_side") === 0, packed)).as("_old"),
        max(when(col("_side") === 1, packed)).as("_new"))
    val changed = compare
      .map(c => !(col(s"_old.$c") <=> col(s"_new.$c")))
      .reduce(_ || _)
    val outVals = compare.flatMap(c =>
      Seq(col(s"_old.$c").as(s"old_$c"), col(s"_new.$c").as(s"new_$c")))
    grouped
      .withColumn("op",
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("op").isNotNull)
      .select(key.map(col) ++ (col("op") +: outVals): _*)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def save(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)
}
