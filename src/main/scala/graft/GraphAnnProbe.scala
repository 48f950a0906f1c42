package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Dev tool: measure the graph-augmented ANN tier's anchored recall vs
  * the pure LSH seed tier (same tables/bits) and the brute truth — the
  * measurement that sets e19's recall floor before the constant is
  * pinned. Usage: runMain graft.GraphAnnProbe [sfDir] [hops] [beam] [degree]
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val hops = if (args.length > 1) args(1).toInt else 2
    val beam = if (args.length > 2) args(2).toInt else 16
    val degree = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val sub = SparkEntry.vecAnchorPred(emb)
    val exact = Similarity.knnBruteFor(
      emb.filter(sub), emb, "vec_id", "embedding", k = 3)
    val lsh = Similarity.knnLsh(emb, "vec_id", "embedding", k = 3,
      dim = 64, bits = 6, tables = 8, queryPred = Some(sub))
    val gr = Similarity.graphAnn(emb, "vec_id", "embedding", k = 3,
      dim = 64, bits = 6, tables = 8, degree = degree, hops = hops,
      beam = beam, queryPred = Some(sub))
    def bp(t: org.apache.spark.sql.DataFrame): Long = {
      val hit = t.select(col("vec_id"), col("neighbor_id")).withColumn("h", lit(1L))
      exact.select(col("vec_id"), col("neighbor_id"))
        .join(hit, Seq("vec_id", "neighbor_id"), "left")
        .agg(floor(sum(coalesce(col("h"), lit(0L))) * lit(10000) / count(lit(1))))
        .head().getLong(0)
    }
    val t0 = System.nanoTime()
    val g = bp(gr)
    val tg = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val l = bp(lsh)
    val tl = (System.nanoTime() - t1) / 1e9
    println(f"GRAPHANNPROBE sf=$sfDir hops=$hops beam=$beam degree=$degree " +
      f"graphBp=$g lshBp=$l graphSec=$tg%.1f lshSec=$tl%.1f")
    spark.stop()
  }
}
