package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time the distributed Unigram-LM (SentencePiece-class) fit at
  * a production vocabulary size — the t25 stretch measurement beside
  * BpeProbe's 32k BPE row.
  * Usage: runMain graft.UnigramProbe [sfDir|gen:<docs>] [vocabSize]
  *        [seedCap] [emRounds]
  */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "gen:100000"
    val vocabSize = if (args.length > 1) args(1).toInt else 32768
    val seedCap = if (args.length > 2) args(2).toInt else vocabSize * 4
    val emRounds = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs =
      if (src.startsWith("gen:")) {
        val n = src.drop(4).toInt
        var seed = 98765L
        def nextInt(m: Int): Int = {
          seed = seed * 6364136223846793005L + 1442695040888963407L
          (((seed >>> 33) % m).toInt + m) % m
        }
        // 676-syllable inventory (all two-letter combos): BpeProbe's
        // 16-syllable corpus prunes to ~1.1k viable unigram pieces —
        // a 32k-piece vocabulary needs substring diversity
        val syl = (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$a$b").toVector
        (1 to n).map { _ =>
          (1 to (4 + nextInt(8))).map(_ =>
            (1 to (1 + nextInt(4))).map(_ => syl(nextInt(676))).mkString
          ).mkString(" ")
        }.toDF("text")
      } else Tables.load(spark, src, "documents")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    val vocab = graft.ext.TextAnalysis.unigramFit(
      docs, "text", vocabSize, seedCap = seedCap, emRounds = emRounds)
    val sec = (System.nanoTime() - t0) / 1e9
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    val multi = vocab.count(v => v._1.codePointCount(0, v._1.length) > 1)
    println(f"UNIGRAMPROBE src=$src vocab=${vocab.length} multi=$multi " +
      f"seedCap=$seedCap emRounds=$emRounds sec=$sec%.1f jobs=$jobs " +
      f"allNeg=${vocab.forall(_._2 < 0L)}")
    spark.stop()
  }
}
