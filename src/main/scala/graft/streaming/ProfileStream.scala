package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** w20 — INCREMENTAL column profiling: [[graft.ops.Profile.profile]]'s
  * streaming twin. A recurring ingest wants the running per-column
  * profile (rows, nulls, distincts, min/max) of everything that has
  * arrived WITHOUT rescanning history each batch; every stat here is
  * maintained from per-batch state deltas:
  *
  *  - counts / typed min / typed max are mergeable scalars — each batch
  *    writes ONE wide partial row (`sum`/`min`/`max` fold, w17's
  *    commutative-associative-idempotent algebra);
  *  - exact distinct counts are NOT mergeable as scalars, so the state
  *    carries the batch-DISTINCT values themselves, rendered through an
  *    INJECTIVE per-column string encoding, as an append-only
  *    `(col_name, v)` log (LSM discipline — the log grows by each
  *    batch's *novel* value volume, never rewritten; the terminal
  *    `count(DISTINCT)` over the log equals the batch-exact distinct
  *    count precisely because the render is injective).
  *
  * Replay safety: per-batch deltas are OVERWRITE-idempotent (keyed by
  * batch id, the w18/t22 discipline), and the folds are
  * order-independent by algebra — a re-delivered batch lands on its own
  * key with identical content.
  *
  * At 100 TB: each micro-batch costs one scan + one wide aggregate + one
  * distinct projection of itself; the fold reads state proportional to
  * (#batches × #cols) partial rows plus the distinct-value log — the
  * corpus itself is never re-read. A column whose distinct cardinality
  * approaches the corpus (an id) makes the log corpus-sized — swap that
  * column to the HLL sketch tier ([[graft.ext.Approx]]) exactly as
  * batch [[graft.ops.Profile]] discloses for `exactDistinct = false`.
  */
object ProfileStream {

  /** Absorb one micro-batch: the wide mergeable partial to
    * `partials/b<id>`, the batch-distinct rendered values to `dv/b<id>`
    * (both overwritten on replay).
    *
    * `distinctRender` MUST be injective per column (distinct values ↔
    * distinct strings) or the folded distinct count undercounts. */
  def absorb(
      batch: DataFrame, cols: Seq[String],
      distinctRender: Map[String, Column => Column],
      stateDir: String, batchId: Long): Unit = {
    def dr(c: String): Column =
      distinctRender.getOrElse(c, (x: Column) => x.cast("string"))(col(c))
    // dv delta FIRST, partials second: the fold keys batch membership on
    // the partials dir, so a crash between the two writes leaves a batch
    // with a dv delta but no partial — invisible to the fold and redone
    // wholesale on replay. The reverse order would silently undercount
    // n_distinct for a torn batch the partials check admits.
    val dv = cols.map { c =>
      batch.filter(col(c).isNotNull)
        .select(lit(c).as("col_name"), dr(c).as("v")).distinct()
    }.reduce(_.unionByName(_))
    dv.write.mode("overwrite").parquet(s"$stateDir/dv/b$batchId")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        min(col(c)).as(s"${c}__mn"),
        max(col(c)).as(s"${c}__mx"))
    }
    batch.agg(count(lit(1)).as("__rows"), aggs: _*)
      .write.mode("overwrite").parquet(s"$stateDir/partials/b$batchId")
  }

  private def deltaDirs(spark: SparkSession, dir: String): Seq[String] =
    StateDirs.deltas(spark, dir).map(_._2)

  /** The folded running profile, shaped exactly like
    * [[graft.ops.Profile.profile]]: one row per column —
    * `(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)`.
    * `render` formats the TYPED folded min/max (typed-first discipline:
    * the fold compares typed values; formatting never decides a
    * winner). Empty profile (0 rows per column) when nothing arrived. */
  def folded(
      spark: SparkSession, stateDir: String, cols: Seq[String],
      render: Map[String, Column => Column] = Map.empty): DataFrame = {
    import spark.implicits._
    val partialDirs = deltaDirs(spark, s"$stateDir/partials")
    if (partialDirs.isEmpty)
      return cols.map(c => (c, 0L, 0L, 0L, null: String, null: String))
        .toDF("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
    def rendered(c: String, agg: Column): Column =
      render.getOrElse(c, (x: Column) => x.cast("string"))(agg)
    val foldAggs = cols.flatMap { c =>
      Seq(sum(col(s"${c}__nn")).as(s"${c}__nn"),
        rendered(c, min(col(s"${c}__mn"))).as(s"${c}__mn"),
        rendered(c, max(col(s"${c}__mx"))).as(s"${c}__mx"))
    }
    val one = spark.read.parquet(partialDirs: _*)
      .agg(sum(col("__rows")).as("__rows"), foldAggs: _*)
    // distinct over the value log: one aggregate, one row, per-column
    // conditional distincts (the log is state-sized, not corpus-sized)
    val dvDirs = deltaDirs(spark, s"$stateDir/dv")
    val dvAggs = cols.map { c =>
      countDistinct(when(col("col_name") === c, col("v"))).as(s"${c}__nd")
    }
    // partials exist but no dv deltas: legal when every absorbed batch
    // had only null values in every profiled column (each per-column dv
    // projection filters nulls, so dv/b<id> can be an empty write that
    // some filesystems elide) — fold to 0 distincts explicitly instead
    // of handing spark.read an empty path list (opaque schema-inference
    // error). A TORN absorb can no longer produce this state: absorb
    // writes dv before partials, so a batch visible to the partials
    // check always has its dv delta.
    val dvSrc =
      if (dvDirs.isEmpty)
        Seq.empty[(String, String)].toDF("col_name", "v")
      else spark.read.parquet(dvDirs: _*)
    val dvOne = dvSrc.agg(dvAggs.head, dvAggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_str"),
        col(s"${c}__mx").as("max_str"))
    }
    one.crossJoin(dvOne) // 1 row × 1 row — a literal gate join, not data
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_str"), col("p.max_str"))
  }

  /** Wire a streaming frame into per-batch [[absorb]] calls. */
  def start(
      stream: DataFrame, cols: Seq[String],
      distinctRender: Map[String, Column => Column],
      stateDir: String, ckptDir: String): StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        absorb(batch, cols, distinctRender, stateDir, id)
      }
      .start()
}
