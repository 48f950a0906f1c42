package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** Dev tool: measure the LSH bucket cap's effect on the candidate feed —
  * capped vs uncapped pair counts and their set difference on the real
  * corpus (expected identical at judged scales: the cap guards against
  * near-identical mega-clusters the df-capped truth tier cannot see
  * anyway), plus the largest (band,key) bucket observed.
  * Usage: runMain graft.LshCapProbe [sfDir]
  */
object LshCapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val capped = TextDedup.lshCandidates(docs, "doc_id", "text", cache = false)
    val uncapped = TextDedup.lshCandidates(docs, "doc_id", "text",
      cache = false, maxBucket = Int.MaxValue)
    val nCap = capped.count()
    val nUncap = uncapped.count()
    val diff = capped.exceptAll(uncapped).count() +
      uncapped.exceptAll(capped).count()
    val hashed = docs.select(col("doc_id"),
      graft.functions.VectorExpressions.shingleHash64(col("text"), 3).as("hh"))
    val sig = hashed.select(col("doc_id"),
      TextDedup.minhashSignature(col("hh"), 32, 42L).as("sig"))
    val mx = sig
      .select(explode(TextDedup.bandKeys(col("sig"), 32, 8)).as("bk"))
      .groupBy(col("bk")).count().agg(max("count")).head().getLong(0)
    println(s"LSHCAPPROBE sf=$sfDir capped=$nCap uncapped=$nUncap " +
      s"setDiff=$diff maxBucket=$mx")
    spark.stop()
  }
}
