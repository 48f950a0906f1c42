package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery

/** w26 — streaming percentile monitoring via EXACT fixed-bin histograms:
  * the p50/p95/p99 observability readout every event pipeline runs,
  * without sketch approximation — values are binned to a fixed integer
  * width at ingest, per-batch histogram deltas are (bin, count) rows,
  * and the fold is a plain sum per bin, so the folded percentile is
  * EXACT at bin resolution and recomputable verbatim by a SQL oracle
  * (unlike t-digest/KLL, whose merge order perturbs estimates — the
  * engine's cross-engine hash gate cannot hold for those).
  *
  * Algebra: histogram addition is commutative/associative/idempotent
  * under per-batch OVERWRITE deltas (w17's union discipline) — the fold
  * is delivery-order-independent and replay-safe with NO order pinning
  * (contrast w21/w25, whose semantics depend on the prefix).
  *
  * At 100 TB: a batch absorbs as one map-side-combinable groupBy(bin) —
  * the shuffle carries #bins rows; state is #bins × #batches rows
  * until [[compact]] folds retired deltas into an immutable base
  * generation behind one atomic pointer (crash-safe — s20's
  * discipline), after which it is #bins + recent deltas for the
  * stream's lifetime; the percentile readout sorts #bins rows, where
  * #bins is the value range over the chosen width — a RESOLUTION
  * constant independent of corpus size, so the one global window in
  * [[percentiles]] is bounded at any scale. The percentile rank test is
  * exact integer cross-multiplication (cum·100 ≥ n·p — no float rank
  * ever computed). */
object HistStream {

  /** Absorb one micro-batch: `bin` must be a deterministic integer
    * binning of the monitored value (e.g. `floor(value·100) div w` —
    * fixed width, fixed at stream start). Overwrite-idempotent. */
  def absorb(batch: DataFrame, bin: Column, stateDir: String,
             batchId: Long): Unit =
    batch.select(bin.as("bin")).filter(col("bin").isNotNull)
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"$stateDir/hist/b$batchId")

  private def fsFor(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // committed-only by default: a TORN delta (no _SUCCESS) is invisible
  // to folds and — critically — to [[compact]], which would otherwise
  // bake the torn batch into the immutable base and retire it past the
  // replay that repairs it; [[vacuum]] lists raw so torn dirs at or
  // below the horizon remain reclaimable
  private def deltaEntries(spark: SparkSession, dir: String,
                           onlyCommitted: Boolean = true): Seq[(Long, String)] =
    StateDirs.deltas(spark, dir, onlyCommitted)

  /** `(generation, folded-delta horizon)` from the `_BASE` pointer, or
    * (0, -1) before the first compaction. */
  private def basePointer(spark: SparkSession, stateDir: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(stateDir, "_BASE")
    val fs = fsFor(spark, stateDir)
    if (!fs.exists(p)) (0L, -1L)
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      val Array(g, h) = txt.split(" ")
      (g.toLong, h.toLong)
    }
  }

  /** The folded histogram `(bin, c)`: the compacted base generation (if
    * any) plus every delta BEYOND the folded horizon. */
  def folded(spark: SparkSession, stateDir: String): DataFrame = {
    val (gen, horizon) = basePointer(spark, stateDir)
    val live = deltaEntries(spark, s"$stateDir/hist")
      .filter(_._1 > horizon).map(_._2)
    val dirs = (if (gen > 0) Seq(s"$stateDir/base/g$gen") else Nil) ++ live
    require(dirs.nonEmpty, s"no histogram state under $stateDir")
    spark.read.parquet(dirs: _*)
      .groupBy(col("bin")).agg(sum(col("c")).as("c"))
  }

  /** Crash-safe delta compaction (s20's pointer discipline): the
    * current fold is written as a NEW immutable base generation, then
    * ONE atomic pointer swing makes it visible and retires every delta
    * at or below the new horizon. A crash anywhere leaves the previous
    * state fully visible (the half-written generation is an orphan to
    * GC); a replayed pre-horizon batch rewrites a delta [[folded]] no
    * longer reads, so compaction does not break overwrite-idempotence.
    * Run periodically and state stays #bins + recent deltas for the
    * stream's whole lifetime. */
  def compact(spark: SparkSession, stateDir: String): Unit = {
    // ONE delta listing feeds BOTH the fold and the recorded horizon: a
    // batch that commits between two separate listings would be baked
    // into the new base while its id exceeds the horizon — and then
    // double-counted by every subsequent folded() read. Folding exactly
    // the listed dirs (not re-calling folded()) closes that race, which
    // matters because compact is documented to run against a live
    // stream.
    val (gen, horizon) = basePointer(spark, stateDir)
    val fresh = deltaEntries(spark, s"$stateDir/hist").filter(_._1 > horizon)
    if (fresh.isEmpty) return
    val newGen = gen + 1
    val newHorizon = fresh.map(_._1).max
    val dirs = (if (gen > 0) Seq(s"$stateDir/base/g$gen") else Nil) ++
      fresh.map(_._2)
    spark.read.parquet(dirs: _*)
      .groupBy(col("bin")).agg(sum(col("c")).as("c"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/base/g$newGen")
    val target = new org.apache.hadoop.fs.Path(stateDir, "_BASE")
    val tmp = new org.apache.hadoop.fs.Path(stateDir, "_BASE.tmp")
    val fs = fsFor(spark, stateDir)
    val out = fs.create(tmp, true)
    try out.write(s"$newGen $newHorizon".getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, fs.getConf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(target),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Garbage collection after [[compact]]: delete deltas at or below
    * the folded horizon and generations STRICTLY BELOW the current one
    * — the files [[folded]] can no longer read (including those a
    * pre-horizon replay re-wrote). Generations ABOVE the pointer are
    * spared: gen+1 may be an in-flight [[compact]]'s half-written
    * output, and a concurrent delete would destroy it mid-commit; a
    * truly torn orphan above the pointer is reclaimed by the next
    * vacuum after the pointer advances past it. Non-numeric names under
    * base/ are ignored (same name hygiene as StateDirs). Returns the
    * deleted dir names. Safe at any point: only unreadable state is
    * touched. */
  def vacuum(spark: SparkSession, stateDir: String): Seq[String] = {
    val (gen, horizon) = basePointer(spark, stateDir)
    val fs = fsFor(spark, stateDir)
    val deadDeltas = deltaEntries(spark, s"$stateDir/hist", onlyCommitted = false)
      .filter(_._1 <= horizon).map(_._2)
    val baseP = new org.apache.hadoop.fs.Path(s"$stateDir/base")
    val deadGens =
      if (!fs.exists(baseP)) Nil
      else fs.listStatus(baseP).toSeq.filter(_.isDirectory)
        .map(_.getPath)
        .filter { p =>
          val sfx = p.getName.drop(1)
          p.getName.startsWith("g") && sfx.nonEmpty &&
            sfx.forall(_.isDigit) && sfx.toLong < gen
        }
        .map(_.toString)
    val doomed = deadDeltas ++ deadGens
    doomed.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    doomed.map(_.split('/').takeRight(2).mkString("/"))
  }

  /** Percentile readout from the folded histogram: for each requested
    * integer percentile p, the smallest bin whose cumulative count
    * reaches ⌈n·p/100⌉ (exact integer test), plus that cumulative
    * count — `(pct, bin, n_le)`. */
  def percentiles(spark: SparkSession, stateDir: String,
                  pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val h = folded(spark, stateDir)
    // #bins is a resolution constant — the single unpartitioned window
    // sorts a bounded frame at any corpus scale (see scaladoc)
    val cum = h
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(h.agg(sum(col("c")).as("n")))
    pcts.map { p =>
      // cum is monotone in bin, so min(cum) over the qualifying set IS
      // the cumulative count at min(bin) — no join-back needed
      cum.filter(col("cum") * 100 >= col("n") * p)
        .agg(min(col("bin")).as("bin"), min(col("cum")).as("n_le"))
        .select(lit(p.toLong).as("pct"), col("bin"), col("n_le"))
    }.reduce(_.unionByName(_))
  }

  /** Wire a streaming frame into per-batch [[absorb]] calls. */
  def start(stream: DataFrame, bin: Column, stateDir: String,
            ckptDir: String): StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorb(batch, bin, stateDir, bid)
      }
      .start()
}
