package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics for the 100 TB deployment (SURVEY.md §4, BASELINE.json
  * design goals): skew mitigation and shuffle-free co-located joins.
  *
  * These are the knobs the engine reaches for when AQE's automatic skew
  * splitting / broadcast promotion isn't enough — e.g. a join key where one
  * study holds 40% of all rows, or a fact-fact join repeated across a
  * pipeline where paying one bucketed write amortizes every later shuffle.
  */
object Scale {

  /** Salted equi-join: `left` (large, skewed) joins `right` (small enough
    * to replicate `salts`×, too big or unsuitable to broadcast). Each left
    * row lands in one of `salts` sub-buckets of its key — deterministic
    * (hash of the whole row, so retries re-derive the same salt); the
    * right side is exploded across all sub-buckets. A hot key's rows then
    * spread over `salts` reducers instead of one.
    *
    * Correctness: salt is an extra equi-key on both sides → result rows
    * are exactly those of the unsalted join. */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // the right side is replicated salts×, so join types that emit
    // UNMATCHED right rows would emit them once per salt copy — reject
    // them instead of silently multiplying rows
    val ok = Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti", "cross")
    require(ok.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti joins; '$joinType' would " +
        "duplicate unmatched right rows across salt copies")
    // salt by a deterministic hash of the row's HASHABLE columns (map
    // columns would fail xxhash64 at analysis time) — deterministic so a
    // partial stage retry recomputes identical shuffle output. Caveat:
    // full-duplicate rows share a salt and stay on one reducer; rows that
    // differ only in map columns do too — add a distinguishing column
    // upstream if either dominates a hot key.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val saltCols = left.schema.fields.filter(f => hashable(f.dataType)).map(_.name)
    require(saltCols.nonEmpty, "saltedJoin: no hashable columns to derive a salt from")
    val saltOfRow = pmod(
      xxhash64(saltCols.toIndexedSeq.map(graft.ColNames.q): _*), lit(salts)).cast("int")
    val l = left.withColumn("__salt", saltOfRow)
    // note: a generator can't be nested in another expression — the int
    // element type of sequence(int, int) already matches the left salt
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Z-ORDER (Morton space-filling-curve) clustering — the multi-column
    * layout compact/`sortKeys` cannot buy: a single-key sort gives each
    * output file a tight range in ONE dimension and the full span in
    * every other, so predicates on the second column prune nothing. The
    * Morton curve interleaves the bits of every key's 16-bit rank
    * bucket, so a contiguous z-range is a compact-ish hyper-box — each
    * file covers a small span in EVERY keyed dimension and parquet
    * row-group min/max stats prune multi-dimensional box predicates
    * (the Delta/Iceberg OPTIMIZE ZORDER BY layout, here as a plain
    * DataFrame transform).
    *
    * Mechanics: per-key [min,max] bounds come from ONE tiny aggregate
    * (collected — a single row, driver-bounded); each key maps to a
    * 16-bit bucket by linear scaling; buckets interleave bit-by-bit into
    * a long z-value (pure `shiftleft`/`bitwiseAnd`/`bitwiseOr` builtins —
    * whole-stage codegen, no UDF); the frame is range-partitioned and
    * within-partition sorted by z. One shuffle, sampling-based balanced
    * ranges, never a global single-partition sort. */
  def zorder(df: DataFrame, keys: Seq[Column], partitions: Int): DataFrame = {
    require(keys.nonEmpty, "zorder: at least one key")
    require(partitions > 0)
    val aggExprs = keys.zipWithIndex.flatMap { case (k, i) =>
      Seq(min(k.cast("double")).as(s"lo$i"), max(k.cast("double")).as(s"hi$i"))
    }
    val bounds = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    val bucketed = keys.zipWithIndex.map { case (k, i) =>
      val (lo, hi) =
        (Option(bounds.get(bounds.fieldIndex(s"lo$i"))).fold(0.0)(_.asInstanceOf[Double]),
         Option(bounds.get(bounds.fieldIndex(s"hi$i"))).fold(0.0)(_.asInstanceOf[Double]))
      if (hi <= lo) lit(0L)
      else least(greatest(
        floor((k.cast("double") - lit(lo)) * 65535.0 / (hi - lo)).cast("long"),
        lit(0L)), lit(65535L))
    }
    val n = bucketed.size
    val z = (for {
      bit <- 0 until 16
      (b, k) <- bucketed.zipWithIndex
    } yield shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)), bit * n + k))
      .reduce(_ bitwiseOR _)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Per-file [min,max] box of `cols` for every data file under `dir` —
    * the zone-map evidence a z-ordered (or range-compacted) layout is
    * judged on. One scan, one file-keyed aggregate; the result is
    * file-count-sized (bounded), safe to collect. */
  def fileBoxes(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(boxExprs(cols).head, boxExprs(cols).tail: _*)

  private def boxExprs(cols: Seq[String]): Seq[Column] =
    cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}_lo"),
      max(col(c).cast("double")).as(s"${c}_hi")))

  /** Write `df` as a bucketed+sorted table: later equi-joins between
    * tables bucketed the same way on the same key are planned WITHOUT a
    * shuffle (and without a sort, since buckets are pre-sorted) — the
    * pay-once-join-many pattern for repeated fact-fact joins.
    * `path` makes it an EXTERNAL table at that location (catalog entries
    * are session-scoped; the data lands where the caller owns storage). */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Small-file COMPACTION — the operational fix for fragmented tables
    * (streaming sinks, per-study micro-writes, over-parallel jobs): at
    * 100 TB a table fractured into KB-scale files pays per-file open/
    * footer/listing costs that dwarf the scan itself, and planner
    * listing time grows with file count, not data size.
    *
    * Rewrites `inDir` into ceil(totalBytes / targetBytes) files at
    * `outDir`. With `sortKeys` the rewrite range-partitions and sorts
    * within files, so each output file covers a tight key range —
    * parquet row-group min/max stats then prune point/range reads (the
    * zone-map layout a fresh compaction should always buy). Without
    * keys it is a plain coalescing rewrite.
    *
    * Returns (filesBefore, filesAfter) from the actual directory
    * listings — the caller's gate evidence. Output is written to a NEW
    * directory; swapping it over the old one is the caller's
    * atomic-publish concern (same discipline as [[graft.sources
    * .XlsxWriter]]'s temp-and-rename, at directory granularity). */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetBytes: Long,
      sortKeys: Seq[Column] = Nil): (Int, Int) = {
    require(targetBytes > 0, "compact: targetBytes must be positive")
    def dataFiles(dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    }
    val before = dataFiles(inDir)
    val total = before.map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1L) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val out =
      if (sortKeys.nonEmpty)
        df.repartitionByRange(n, sortKeys: _*).sortWithinPartitions(sortKeys: _*)
      else df.repartition(n)
    out.write.mode("overwrite").parquet(outDir)
    (before.size, dataFiles(outDir).size)
  }
}
