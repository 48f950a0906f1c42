package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  def knnBrute(emb: DataFrame, id: String, vec: String, k: Int): DataFrame =
    knnBruteFor(emb, emb, id, vec, k)

  /** Exact top-k for a SUBSET of query vectors against a full corpus —
    * the ground-truth generator for recall gating: O(|queries|·n) instead
    * of O(n²), so a deterministic 20% query sample costs 1/5th of the full
    * verifier while measuring the same per-query recall. */
  def knnBruteFor(queries: DataFrame, corpus: DataFrame,
                  id: String, vec: String, k: Int): DataFrame = {
    // The inequality self-join is a nested-loop join whose parallelism is
    // the streamed side's partitioning; a single-file parquet read would
    // put the whole O(n²) kernel on one core. Spread the streamed side
    // across the cluster first (tiny shuffle of n rows).
    val a = queries.select(col(id).as("vec_id"), col(vec).as("va"))
      .repartition(queries.sparkSession.sparkContext.defaultParallelism)
    val b = corpus.select(col(id).as("neighbor_id"), col(vec).as("vb"))
    val pairs = a.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    rankTopK(pairs, k)
  }

  /** Rank candidate pairs `(vec_id, neighbor_id, sim)` down to the top-k
    * per query vector — via the bounded [[graft.functions.TopKAggregate]],
    * NOT a `row_number()` window: the window form shuffles and sorts every
    * candidate pair, while the aggregate reduces each map task's slice to
    * ≤ k entries per vec_id before the exchange, so the shuffle carries
    * O(n·k) rows regardless of candidate volume. Ordering (sim desc, id
    * asc; Double.compare NaN semantics; null sims last) is bit-identical
    * to the window form — pinned by TopKSpec and the unchanged e1 oracle
    * hash. Non-integral id columns (string/UUID keys) keep the window
    * formulation — the aggregate's buffer is long-keyed — with identical
    * results either way. Rows with a null neighbor id are excluded from
    * ranking in BOTH forms (the aggregate's buffer cannot hold them; the
    * window branch filters them explicitly to stay aligned). */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val idType = pairs.schema("neighbor_id").dataType
    idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        pairs.groupBy(col("vec_id"))
          .agg(graft.functions.TopKAggregate
            .topkIdsBy(col("sim"), col("neighbor_id").cast("long"), k).as("top"))
          .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "neighbor_id")))
          .select(col("vec_id"),
            col("neighbor_id").cast(idType).as("neighbor_id"), // original key type
            (col("pos") + 1).cast("long").as("rank"))
      case _ =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id"))
        pairs
          .filter(col("neighbor_id").isNotNull) // match the aggregate branch
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col("vec_id"), col("neighbor_id"), col("rank"))
    }
  }

  /** Random-hyperplane LSH signature: an integer bucket id from `bits`
    * sign bits. One compiled expression carrying the plane matrix as a
    * reference object — NOT `bits` literal-array dot products: the
    * literal-tree form generated pathological Janino classes (48 planes ×
    * 64 lit() elements), filled the JVM code cache and slowed every
    * subsequent query in the session by 5-10×. Plane generation is shared
    * with the SQL surface (`hyperplane_bucket(vec, dim, bits, seed)`). */
  def lshBucket(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    graft.functions.VectorExpressions.hyperplaneBucket(vec,
      graft.functions.VectorExpressions.seededPlanes(dim, bits, seed))

  /** Approximate k-NN via MULTI-TABLE random-hyperplane LSH: `tables`
    * independent hash tables (seeded hyperplane sets); candidates are the
    * union of same-bucket vectors across tables, deduped, then ranked by
    * exact cosine.
    *
    * Why multi-table: a single b-bit table only recalls a neighbor at
    * p_bit^b (p_bit = 1 − θ/π); for cos≈0.45 and b=8 that's ~3% — measured
    * exactly that on this corpus. L tables lift it to 1−(1−p^b)^L while
    * candidate volume stays L·n²/2^b — the standard recall/cost dial
    * (bits ↑ = fewer candidates, tables ↑ = higher recall). */
  def knnLsh(emb: DataFrame, id: String, vec: String, k: Int,
             dim: Int, bits: Int = 6, tables: Int = 8, seed: Long = 42L,
             queryPred: Option[Column] = None): DataFrame = {
    val buckets = array((0 until tables).map(l =>
      lshBucket(col(vec), dim, bits, seed + l)).toIndexedSeq: _*)
    def sigs(df: DataFrame) =
      df.select(col(id), posexplode(buckets).as(Seq("tbl", "bucket")))
    // queryPred restricts WHICH vectors we search for (the a-side) without
    // shrinking the candidate corpus (the b-side) — the recall-gate shape.
    val a = sigs(queryPred.fold(emb)(emb.filter))
      .select(col("tbl"), col("bucket"), col(id).as("vec_id"))
    val b = sigs(emb).select(col("tbl"), col("bucket"), col(id).as("neighbor_id"))
    // dedupe the id pairs FIRST (16-byte rows through the shuffle), then
    // attach the vectors — carrying both embeddings through the
    // union-across-tables distinct would shuffle ~30× more bytes
    val cand = a.join(b, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"))
      .dropDuplicates("vec_id", "neighbor_id")
    val va = emb.select(col(id).as("vec_id"), col(vec).as("va"))
    val vb = emb.select(col(id).as("neighbor_id"), col(vec).as("vb"))
    val pairs = cand.join(va, Seq("vec_id")).join(vb, Seq("neighbor_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    rankTopK(pairs, k)
  }

  /** IVF (inverted-file) approximate k-NN — the centroid-bucketed scale
    * path: vectors are assigned to their nearest of `nCells` centroids;
    * a query probes its `nProbe` nearest cells only.
    *
    * Centroids come from a deterministic driver-side Lloyd's run over a
    * bounded sample (sorted-id prefix). At 100 TB the sample is still
    * driver-sized (centroids are nCells×dim doubles); assignment is a
    * compiled argmin over the literal centroid matrix — one projection,
    * no shuffle — and the search is an equi-join on cell id, exactly the
    * LSH shape but with data-adaptive partitions (better recall per
    * candidate on clustered embeddings).
    */
  def knnIvf(emb: DataFrame, id: String, vec: String, k: Int,
             nCells: Int = 16, nProbe: Int = 4, sampleN: Int = 256,
             iters: Int = 5, queryPred: Option[Column] = None): DataFrame = {
    // --- driver-side centroid fit (deterministic) ---
    val sample = emb.orderBy(col(id)).limit(sampleN)
      .select(col(vec)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty embedding table")
    val dim = sample.head.length
    var centroids = sample.distinct.take(nCells)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      for (v <- sample) {
        val c = nearest(centroids, v)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else { val m = sums(c); var d = 0; while (d < dim) { m(d) /= counts(c); d += 1 }; m }
      }
      it += 1
    }
    // --- compiled cell assignment: one expression holding the centroid
    // matrix as a reference object (see lshBucket's note on why not a
    // literal-array tree) ---
    import graft.functions.VectorExpressions.nearestCells
    val cm = centroids
    val data = emb.select(col(id).as("neighbor_id"), col(vec).as("vb"),
      element_at(nearestCells(col(vec), cm, 1), 1).as("cell"))
    // centroids are always fit on the FULL table (deterministic regardless
    // of the query subset); queryPred only restricts the probe side.
    val probes = queryPred.fold(emb)(emb.filter)
      .select(col(id).as("vec_id"), col(vec).as("va"),
        explode(nearestCells(col(vec), cm, nProbe)).as("cell"))
    val pairs = probes.join(data, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    rankTopK(pairs, k)
  }

  private def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val cc = centroids(c)
      while (i < v.length) { val x = v(i) - cc(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Recall@k of an approximate k-NN result against the exact one, shaped
    * for the driver's oracle gate: ONE row `(n_query_vecs, recall_ok)`
    * where `recall_ok = 1` iff recall in basis points ≥ `minBp`.
    *
    * Both inputs are `(vec_id, neighbor_id, rank)` frames. The oracle SQL
    * side is `SELECT count(*), CAST(1 AS BIGINT) FROM embeddings WHERE
    * <query subset>` — so the hash gate collapses if the ANN path stops
    * finding the true neighbors (flag flips to 0) or the query plumbing
    * breaks (count drifts). Everything is deterministic: seeded planes /
    * sorted-sample centroids, id tie-breaks, integer basis points.
    */
  def recallGate(approx: DataFrame, exact: DataFrame, minBp: Int): DataFrame = {
    val hit = approx.select(col("vec_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    exact.select(col("vec_id"), col("neighbor_id"))
      .join(hit, Seq("vec_id", "neighbor_id"), "left")
      .agg(
        count_distinct(col("vec_id")).as("n_query_vecs"),
        when(floor(sum(coalesce(col("hit"), lit(0L))) * lit(10000) / count(lit(1)))
          >= minBp, lit(1L)).otherwise(lit(0L)).as("recall_ok"))
  }

  /** Scalar int8 quantization of an embedding column — the standard 4×
    * storage compression for vector stores: each vector is scaled by its
    * own max-abs into [-127, 127] ints; [[dequantizeInt8]] reconstructs
    * floats with ≤ maxAbs/254 per-element error. Emitted as a struct
    * `(q: array<int>, scale: double)` so the pair travels together.
    * Whether the loss is acceptable is an EMPIRICAL question per corpus —
    * which is what the e8 recall gate measures (quantized k-NN vs
    * full-precision exact). */
  def quantizeInt8(vec: Column): Column = {
    val scale = greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30))
    struct(
      transform(vec, x => round(x.cast("double") / scale * 127).cast("int")).as("q"),
      scale.as("scale"))
  }

  /** Inverse of [[quantizeInt8]]: back to array<float> for the cosine
    * kernels. */
  def dequantizeInt8(qs: Column): Column =
    transform(qs.getField("q"), x =>
      (x.cast("double") * qs.getField("scale") / 127).cast("float"))

  /** Embedding hygiene stats: dimension and L2 norm per vector (norm
    * rounded so the double is bit-stable across engines). */
  def stats(emb: DataFrame, id: String, vec: String): DataFrame =
    emb.select(
      col(id),
      size(col(vec)).cast("long").as("dim"),
      round(norm(col(vec)), 4).as("l2_norm"))
}
