package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - Brute-force cosine top-k: exact baseline. The k-NN self-join is a
  *    cartesian product — correct at test scale and as a per-partition
  *    refinement step, but O(n²) overall; at 100 TB it exists only as the
  *    verifier for the bucketed path below.
  *  - Random-hyperplane LSH: each vector gets a small bit-signature
  *    (sign of dot products with seeded fixed hyperplanes); search becomes
  *    an equi-join on the signature bucket. This is the scale path: the
  *    cross product collapses to per-bucket joins, which Spark plans as a
  *    shuffle join keyed by bucket (AQE handles skewed buckets).
  *
  * All vector math uses `zip_with`/`aggregate` HOFs over the array column
  * with a double accumulator — codegen'd, no UDF, deterministic
  * (sequential fold = identical FP rounding on every engine/run).
  */
object Similarity {

  /** Dot product (HOF form — portable/reference implementation; the hot
    * path uses the codegen'd [[graft.functions.VectorExpressions]] kernel,
    * which folds in the same element order → bit-identical doubles). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Dot product of two numeric-array columns (compiled, codegen'd). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass compiled cosine (dot and both norms in one loop). */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorExpressions.vecCosine(a, b)

  /** Exact k-NN: for each vector, the k nearest others by cosine.
    * Output (vec_id, neighbor_id, rank); ties broken by neighbor id so the
    * result is fully deterministic (similarity values themselves are not
    * emitted — FP ulps must not decide hash equality). */
  def knnBrute(emb: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    // The inequality self-join is a nested-loop join whose parallelism is
    // the streamed side's partitioning; a single-file parquet read would
    // put the whole O(n²) kernel on one core. Spread the streamed side
    // across the cluster first (tiny shuffle of n rows).
    val a = emb.select(col(id).as("vec_id"), col(vec).as("va"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = emb.select(col(id).as("neighbor_id"), col(vec).as("vb"))
    val pairs = a.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"))
  }

  /** Seeded random hyperplanes: `bits` hyperplanes in `dim` dimensions. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH signature: an integer bucket id from `bits`
    * sign bits. Pure projection; the hyperplanes are literal arrays baked
    * into the plan (tiny: bits × dim doubles). */
  def lshBucket(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, bits, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit(_)).toIndexedSeq: _*)
      when(dot(vec, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate k-NN: candidates limited to same-bucket vectors, then
    * exact cosine ranking within the bucket. Recall is tuned by `bits`
    * (fewer bits → bigger buckets → higher recall, more compute). */
  def knnLsh(emb: DataFrame, id: String, vec: String, k: Int,
             dim: Int, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val sig = emb.select(col(id), col(vec),
      lshBucket(col(vec), dim, bits, seed).as("bucket"))
    val a = sig.select(col("bucket"), col(id).as("vec_id"), col(vec).as("va"))
    val b = sig.select(col("bucket"), col(id).as("neighbor_id"), col(vec).as("vb"))
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"))
  }

  /** Embedding hygiene stats: dimension and L2 norm per vector (norm
    * rounded so the double is bit-stable across engines). */
  def stats(emb: DataFrame, id: String, vec: String): DataFrame =
    emb.select(
      col(id),
      size(col(vec)).cast("long").as("dim"),
      round(norm(col(vec)), 4).as("l2_norm"))
}
