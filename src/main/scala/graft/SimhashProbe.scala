package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** Dev tool: print the SimHash Hamming-distance distribution over the
  * EXACT near-duplicate pairs (d6 ground truth) and over non-duplicate
  * consecutive-id pairs, so the d10 gate constants in [[SparkEntry]] are
  * set from measurement, not guesswork.
  * Usage: runMain graft.SimhashProbe <sfDir>
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val sig = docs.select(col("doc_id"), TextDedup.simhash(col("text")).as("sh"))

    def dist(pairs: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val h = pairs
        .join(sig.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a")), Seq("doc_id_a"))
        .join(sig.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b")), Seq("doc_id_b"))
        .select(TextDedup.hamming(col("sh_a"), col("sh_b")).as("d"))
      val stats = h.agg(count(lit(1)), min("d"), expr("percentile(d, 0.5)"),
        expr("percentile(d, 0.9)"), max("d")).head()
      println(s"HAMMING $label sf=$sfDir n=${stats.getLong(0)} min=${stats.getLong(1)} " +
        s"p50=${stats.getDouble(2)} p90=${stats.getDouble(3)} max=${stats.getLong(4)}")
    }

    val truePairs = TextDedup.exactJaccardPairs(docs, "doc_id", "text", n = 3, minJ = 0.3)
      .select(col("doc_id_a"), col("doc_id_b"))
    dist(truePairs, "true-dup")
    val consec = docs.select(col("doc_id").as("doc_id_a"),
      (col("doc_id") + 1).as("doc_id_b"))
    dist(consec, "consecutive")
    spark.stop()
  }
}
