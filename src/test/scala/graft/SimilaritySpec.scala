package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** ANN quality: the approximate paths must recall a reasonable fraction of
  * the exact top-k (they trade recall for pruning; zero overlap would mean
  * the bucketing is broken, not just lossy). */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def recallAgainstBrute(approx: org.apache.spark.sql.DataFrame): Double = {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", k = 3)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = approx.select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  test("IVF k-NN recalls a meaningful share of exact top-3") {
    val emb = Tables.load(spark, sf, "embeddings")
    val r = recallAgainstBrute(
      Similarity.knnIvf(emb, "vec_id", "embedding", k = 3, nCells = 16, nProbe = 4))
    assert(r > 0.2, s"IVF recall@3 = $r")
  }

  test("LSH k-NN recalls a meaningful share of exact top-3") {
    val emb = Tables.load(spark, sf, "embeddings")
    val r = recallAgainstBrute(
      Similarity.knnLsh(emb, "vec_id", "embedding", k = 3, dim = 64, bits = 6, tables = 8))
    assert(r > 0.3, s"LSH recall@3 = $r")
  }

  test("IVF emits at most k ranked neighbors per vector, ranks contiguous") {
    val emb = Tables.load(spark, sf, "embeddings")
    val out = Similarity.knnIvf(emb, "vec_id", "embedding", k = 3)
    val bad = out.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("n") > 3 || col("mx") > 3 || col("mn") =!= 1)
    assert(bad.isEmpty)
  }
}
