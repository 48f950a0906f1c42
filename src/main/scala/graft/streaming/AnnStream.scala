package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ext.Similarity

/** w25 — STREAMING ANN index maintenance: e7's IVF tier fed by a vector
  * stream. The coarse quantizer (k-means codebook) is fit ONCE, on the
  * first delivered batch (the bootstrap corpus), persisted as a tiny
  * parquet state table, and every later batch is ASSIGNED against that
  * frozen codebook — one compiled argmin projection per batch, no
  * shuffle, exactly the cost profile an online vector store pays on
  * ingest. Assignments land in per-batch OVERWRITE deltas (w18/t22
  * discipline), so the folded index is replay-identical; batch-0 replay
  * refits from the same rows ([[Similarity.kmeansFit]]'s init is
  * content-addressed, not order-dependent) and overwrites the same
  * codebook.
  *
  * DRIFT is the operational risk of a frozen codebook: if the stream's
  * distribution moves, vectors land ever farther from their centroids
  * and recall decays silently. Each batch therefore writes a drift
  * partial — Σ floor(cos(vec, centroid)·10⁴) and the row count — and
  * [[folded]] exposes per-batch mean centroid-cosine so a monitor can
  * flag "refit needed" when later batches fall below the bootstrap
  * fit quality by more than a margin. The refit itself is the batch
  * engine's job (e9's kmeansFit over the accumulated corpus) — the
  * same global-vs-incremental split as w18/w21.
  *
  * At 100 TB: per batch the work is batch-sized (argmin + two appends);
  * state grows by the assignments (id+cell per vector — the IVF index
  * itself) plus one constant-size codebook. Nothing rescans the
  * accumulated corpus. */
object AnnStream {

  private def centroidDir(stateDir: String) = s"$stateDir/centroids"

  /** The frozen codebook, or None before the bootstrap batch landed.
    * A codebook counts as present only with its `_SUCCESS` marker — a
    * write torn by a crash is invisible, so the bootstrap replay refits
    * (deterministically: kmeansFit's init is content-addressed) and
    * overwrites the partial dir instead of failing on it. */
  def centroids(spark: SparkSession, stateDir: String): Option[Array[Array[Double]]] = {
    val p = new org.apache.hadoop.fs.Path(centroidDir(stateDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) None
    else {
      val rows = spark.read.parquet(p.toString)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val k = rows.map(_._1).max + 1
      val dim = rows.map(_._2).max + 1
      val m = Array.fill(k)(new Array[Double](dim))
      rows.foreach { case (c, d, v) => m(c)(d) = v }
      Some(m)
    }
  }

  /** Absorb one micro-batch: bootstrap-fit (batch 0 only) or assign
    * against the frozen codebook; write the assignment delta and the
    * drift partial (both overwritten on replay). */
  def absorb(batch: DataFrame, id: String, vec: String, k: Int,
             stateDir: String, batchId: Long, iters: Int = 5): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // a trailing empty trigger must not become a bootstrap attempt or a
    // zero-row drift partial (0-div guard + the batch-id set the fold
    // monitors)
    if (batch.isEmpty) return
    val cm = centroids(spark, stateDir) match {
      case Some(m) => m
      case None =>
        val (m, _) = Similarity.kmeansFit(batch, id, vec, k, iters, cache = false)
        m.zipWithIndex.flatMap { case (row, c) =>
          row.zipWithIndex.map { case (v, d) => (c, d, v) }
        }.toSeq.toDF("cell", "pos", "v")
          .coalesce(1).write.mode("overwrite").parquet(centroidDir(stateDir))
        m
    }
    // centroid vectors as ONE literal array-of-arrays (16 Literal nodes,
    // not a per-element tree — the lshBucket Janino lesson)
    val centArr = array(cm.map(row => lit(row.map(_.toFloat))).toIndexedSeq: _*)
    val assigned = Similarity.kmeansAssignWithVec(batch, id, vec, cm)
      .withColumn("__cos", Similarity.cosine(col(vec),
        element_at(centArr, col("cell") + 1)))
    assigned.select(col(id), col("cell"))
      .write.mode("overwrite").parquet(s"$stateDir/assign/b$batchId")
    assigned.agg(
        count(lit(1)).as("n"),
        coalesce(sum(floor(col("__cos") * 10000).cast("long")), lit(0L)).as("cos_bp_sum"))
      .select(lit(batchId).as("batch_id"), col("n"), col("cos_bp_sum"))
      .write.mode("overwrite").parquet(s"$stateDir/drift/b$batchId")
  }

  private def deltaDirs(spark: SparkSession, dir: String): Seq[String] =
    StateDirs.deltas(spark, dir).map(_._2)

  /** The folded IVF assignment table `(id, cell)` across every
    * delivered batch — or, with `upTo`, across only the ingest PREFIX of
    * batch ids ≤ upTo (the serving-time-travel leg of e20: the index
    * "as of" an earlier delivery, read straight from the retained delta
    * dirs, no rewrite). */
  def folded(spark: SparkSession, stateDir: String,
             upTo: Option[Long] = None): DataFrame = {
    val dirs = StateDirs.deltas(spark, s"$stateDir/assign")
      .filter { case (bid, _) => upTo.forall(bid <= _) }
      .map(_._2)
    require(dirs.nonEmpty, s"no assignment deltas under $stateDir")
    spark.read.parquet(dirs: _*)
  }

  /** Per-batch drift monitor rows `(batch_id, n, mean_cos_bp)` — mean
    * cosine of each batch's vectors to their assigned centroid, in
    * basis points (integer — the t18 fixed-point discipline). */
  def drift(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = deltaDirs(spark, s"$stateDir/drift")
    require(dirs.nonEmpty, s"no drift partials under $stateDir")
    spark.read.parquet(dirs: _*)
      .select(col("batch_id"), col("n"),
        expr("cos_bp_sum div n").as("mean_cos_bp"))
  }

  /** Wire a streaming vector frame into per-batch [[absorb]] calls. */
  def start(vectors: DataFrame, id: String, vec: String, k: Int,
            stateDir: String, ckptDir: String): StreamingQuery =
    vectors.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        absorb(batch, id, vec, k, stateDir, bid)
      }
      .start()
}
