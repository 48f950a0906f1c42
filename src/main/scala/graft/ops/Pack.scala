package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: concatenate a corpus in a
  * deterministic document order and cut it into fixed token-budget packs;
  * each document is assigned the pack in which its first token lands (the
  * standard concat-and-chunk used to build fixed-length training
  * sequences).
  *
  * The pack id is `floor(exclusive_prefix_sum(tokens) / budget)` over the
  * id-ordered corpus — a global running total. The scalable form is NOT a
  * global window (an un-partitioned window funnels 100 TB through one
  * task): it is the two-pass distributed prefix sum —
  *
  *   1. range-partition + sort by id (one shuffle, the same one any
  *      global ordering costs), then one cheap pass computing per-
  *      partition token totals (O(#partitions) rows to the driver);
  *   2. per-partition exclusive offsets from those totals ship back in
  *      the task closure and a second pass streams each partition once,
  *      accumulating locally.
  *
  * Both passes are embarrassingly parallel; the only sequential state is
  * the #partitions-sized offset table. RangePartitioner places ascending
  * id ranges on ascending partition ids, which is what makes the per-
  * partition offsets globally correct.
  */
object Pack {

  /** Assign each row its running token offset (`prior`) and pack id.
    * `idCol` must be unique and integral; `tokCol` integral and
    * non-negative. Output columns: idCol, tokCol, prior, pack_id.
    */
  def packSequences(df: DataFrame, idCol: String, tokCol: String,
                    budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "packSequences: budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nParts =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol).cast("long").as("_1"),
              col(tokCol).cast("long").as("_2"))
      .repartitionByRange(nParts, col("_1"))
      .sortWithinPartitions("_1")
      .withColumn("_3", spark_partition_id())

    // pass 1: per-partition token totals -> exclusive prefix offsets.
    // O(#partitions) rows; the shuffle is 32 rows wide.
    val sums = sorted.groupBy("_3").agg(sum("_2").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (sums.isEmpty) -1 else sums.keys.max
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 to maxPid).map { p =>
        val o = p -> acc; acc += sums.getOrElse(p, 0L); o
      }.toMap
    }

    // pass 2: stream each partition once with its starting offset.
    sorted.as[(Long, Long, Int)].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val buf = it.buffered
        var run = offsets(buf.head._3)
        buf.map { case (idv, tk, _) =>
          val prior = run; run += tk; (idv, tk, prior)
        }
      }
    }.toDF(idCol, tokCol, "prior")
      .withColumn("pack_id", expr(s"prior DIV $budget"))
  }
}
