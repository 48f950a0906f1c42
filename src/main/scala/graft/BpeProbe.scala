package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time the distributed BPE fit at a real merge count and
  * report rounds (Spark jobs) vs merges — the batched-selection payoff —
  * plus equality against the sequential driver-local fit.
  * Usage: runMain graft.BpeProbe [sfDir|gen:<docs>] [nMerges] [batchN]
  *        [candPool] [strict|skip] [local|nolocal]
  * `nolocal` skips the sequential driver-local twin fit (at 32k merges
  * the O(merges·corpus) sequential fit dominates the distributed one
  * being measured).
  * `gen:<docs>` builds a seeded syllable corpus (diverse enough to
  * sustain 1k+ merges; the sf documents table exhausts at ~90). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nMerges = if (args.length > 1) args(1).toInt else 1000
    val batchN = if (args.length > 2) args(2).toInt else 64
    val candPool = if (args.length > 3) args(3).toInt else 4096
    val strict = args.length <= 4 || args(4) != "skip"
    val runLocal = args.length <= 5 || args(5) != "nolocal"
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
        val syl = Vector("ka", "to", "mi", "ra", "zu", "ne", "pa", "lo",
          "qi", "ve", "wu", "sho", "tri", "ble", "dor", "fyn")
        (1 to n).map { _ =>
          (1 to (4 + nextInt(8))).map(_ =>
            (1 to (1 + nextInt(4))).map(_ => syl(nextInt(16))).mkString
          ).mkString(" ")
        }.toDF("text")
      } else Tables.load(spark, src, "documents")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    val dist = graft.ext.TextAnalysis.bpeLearn(
      docs, "text", nMerges, batchN, candPool, strict)
    val distSec = (System.nanoTime() - t0) / 1e9
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    if (runLocal) {
      val texts = docs.select("text").collect().map(_.getString(0)).toSeq
      val t1 = System.nanoTime()
      val local = graft.ext.TextAnalysis.bpeLearnLocal(texts, nMerges)
      val localSec = (System.nanoTime() - t1) / 1e9
      println(f"BPEPROBE src=$src merges=${dist.length} batchN=$batchN " +
        f"pool=$candPool strict=$strict distSec=$distSec%.1f jobs=$jobs " +
        f"localSec=$localSec%.1f orderEqual=${dist == local} " +
        f"setEqual=${dist.toSet == local.toSet}")
    } else {
      println(f"BPEPROBE src=$src merges=${dist.length} batchN=$batchN " +
        f"pool=$candPool strict=$strict distSec=$distSec%.1f jobs=$jobs " +
        "local=skipped")
    }
    spark.stop()
  }
}
