package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Dev tool: print the actual recall@3 (basis points) of the LSH and IVF
  * paths vs exact ground truth on the e6/e7 query sample, so the gate
  * constants in [[SparkEntry]] are set from measurement, not guesswork.
  * Usage: runMain graft.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    // the anchored query set the e6/e7/e8/e11/e14 gates actually use
    val sub = Similarity.anchorPred(emb, "vec_id", SparkEntry.VecAnchorK)
    val exact = Similarity.knnBruteFor(emb.filter(sub), emb, "vec_id", "embedding", 3)
      .select(col("vec_id"), col("neighbor_id")).cache()
    def bp(approx: org.apache.spark.sql.DataFrame): Long = {
      val hit = approx.select(col("vec_id"), col("neighbor_id")).withColumn("hit", lit(1L))
      exact.join(hit, Seq("vec_id", "neighbor_id"), "left")
        .agg(floor(sum(coalesce(col("hit"), lit(0L))) * lit(10000) / count(lit(1))))
        .head().getLong(0)
    }
    val lsh = bp(Similarity.knnLsh(emb, "vec_id", "embedding", 3, 64, 6, 8, queryPred = Some(sub)))
    val ivf = bp(Similarity.knnIvf(emb, "vec_id", "embedding", 3, 16, 4, queryPred = Some(sub)))
    val deq = emb.select(col("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("embedding"))
    val q8 = bp(Similarity.knnBruteFor(deq.filter(sub), deq, "vec_id", "embedding", 3))
    // PQ (e11's shipped config, m=16/ksub=256): its contracts are the
    // SHORTLIST recall (true top-3 inside the PQ top-10 an ADC scan
    // hands a re-ranker) and reconstruction fidelity (mean cosine
    // original vs decoded) — direct recall@3 among this corpus'
    // near-tied cosines is unstable under ANY reconstruction error and
    // is printed only for context. Config chosen by a measured sweep
    // (m=8/ksub=16 → recon 6208 bp; 8/256 → 8771; 16/256 → 9656 at
    // sf0.1, commit history has the full table).
    val books = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 16, ksub = 256, sampleN = 2048, iters = 6)
    val pq = emb.select(col("vec_id"),
      Similarity.pqDecode(Similarity.pqEncode(col("embedding"), books), books).as("embedding"))
    val pqR3 = bp(Similarity.knnBruteFor(emb.filter(sub), pq, "vec_id", "embedding", 3))
    val pqShort = bp(Similarity.knnBruteFor(emb.filter(sub), pq, "vec_id", "embedding", 10))
    val pqRecon = emb.select(col("vec_id"), col("embedding").as("o"))
      .join(pq.select(col("vec_id"), col("embedding").as("r")), Seq("vec_id"))
      .agg(floor(avg(Similarity.cosine(col("o"), col("r"))) * 10000)).head().getLong(0)
    // IVF-PQ composite (e14's shipped config): shortlist recall of the
    // ADC top-10 over nProbe=4 of 16 cells vs the exact top-3.
    val ix = Similarity.ivfPqFit(emb, "vec_id", "embedding",
      nCells = 16, m = 16, ksub = 256, sampleN = 2048, iters = 6)
    val ivfpqShort = bp(Similarity.ivfPqSearch(ix, emb.filter(sub),
      "vec_id", "embedding", k = 10, nProbe = 4))
    println(s"RECALL sf=$sfDir lsh_bp=$lsh ivf_bp=$ivf int8_bp=$q8 " +
      s"pq_r3_bp=$pqR3 pq_short10_bp=$pqShort pq_recon_bp=$pqRecon " +
      s"ivfpq_short10_bp=$ivfpqShort")
    spark.stop()
  }
}
