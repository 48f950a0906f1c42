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
    val sub = col("vec_id") % 5 === 0
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
    println(s"RECALL sf=$sfDir lsh_bp=$lsh ivf_bp=$ivf int8_bp=$q8")
    spark.stop()
  }
}
