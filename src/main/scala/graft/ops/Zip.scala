package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J2 — positional column concat (`cds-transformation.py:26-27,54-56`):
  * pandas `pd.concat([a, b], axis=1)` zips two frames row-by-row with the
  * longer side truncated. Relational engines have no row order, so the
  * zip must be made explicit: each side gets a row index under a CALLER-
  * SUPPLIED total ordering, then an inner equi-join on the index (inner =
  * the reference's truncation of the longer side).
  *
  * Scale note: `row_number` over an un-partitioned window funnels each
  * side through one task — acceptable for the reference's v1 workbook
  * frames (10⁴–10⁵ rows) where this operator appears, and inherently so:
  * a global positional zip IS a sequential construct. Data-scale zips
  * should use keyed joins instead (the engine's J1/J5 paths).
  */
object Zip {

  def positional(
      a: DataFrame, orderA: Seq[Column],
      b: DataFrame, orderB: Seq[Column],
      idxCol: String = "rn"): DataFrame = {
    val ra = a.withColumn(idxCol,
      row_number().over(Window.orderBy(orderA: _*)).cast("long"))
    val rb = b.withColumn(idxCol,
      row_number().over(Window.orderBy(orderB: _*)).cast("long"))
    ra.join(rb, Seq(idxCol))
  }

  /** Contiguous global ordinal `1..n` under `order` WITHOUT the
    * single-task window: range-repartition on the order keys, rank
    * within each partition, add per-partition offsets (one tiny count
    * aggregate collected to the driver — `numShufflePartitions` rows).
    * Every partition sorts its slice in parallel; no task ever sees the
    * whole table. Deterministic whenever `order` is a total order (unique
    * keys): a row's global rank is its position in that order, which no
    * choice of range boundaries can move.
    *
    * This is the scale path for positional semantics: [[positional]]'s
    * un-partitioned `row_number` is fine at the reference's workbook
    * sizes, but a corpus-sized frame should rank through here (two extra
    * jobs — the range sampler and the count pass — buy full parallelism
    * on the sort itself). */
  def globalRank(df: DataFrame, order: Seq[Column], idxCol: String = "rn"): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // the range partitioner SAMPLES its boundaries per execution, so the
    // count pass and the consumer's action would otherwise see DIFFERENT
    // partitionings and the per-partition offsets would misalign
    // (measured: overlapping ranks). Cut the lineage eagerly — one
    // materialized partitioning serves both (Cascade.Auto: reliable
    // checkpoint on clusters with a checkpoint dir, local otherwise).
    val ranged = Cascade.cut(
      df.repartitionByRange(parts, order: _*)
        .withColumn("__pid", spark_partition_id()),
      Cascade.Auto, eager = true)
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + counts(p)))
    val offExpr = offsets.foldLeft(lit(0L)) { case (e, (p, off)) =>
      when(col("__pid") === p, lit(off)).otherwise(e)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    ranged
      .withColumn(idxCol, row_number().over(w).cast("long") + offExpr)
      .drop("__pid")
  }
}
