package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextDedup
import graft.ops.Components
import graft.SparkEntry.{DupShingleMaxDf, truthAnchors}

/** Dev tool: print the ACTUAL recall basis points behind the d7 (pair)
  * and d16 (cluster co-membership) gates at an arbitrary SF, so the
  * judged sf≤0.1 floors carry measured sf1 evidence in BASELINE.md —
  * the round-13/14 RecallProbe pattern applied to the text-dedup LSH
  * tier. Prints wall seconds per leg too (the slope evidence).
  * Usage: runMain graft.DedupRecallProbe [sfDir]
  */
object DedupRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 65536)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // d7: anchored exact truth vs the shipped nearDuplicates LSH tier
    val truth = TextDedup.anchoredJaccardPairs(docs, truthAnchors(docs),
        "doc_id", "text", n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
      .select(col("doc_id_a"), col("doc_id_b")).cache()
    val (truthA, tTruthA) = timed(truth.count())
    val cand = TextDedup.nearDuplicates(docs, "doc_id", "text",
        threshold = 0.3)
      .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"))
      .cache()
    val (nLsh, tLsh) = timed(cand.count())
    val d7bp = truth.join(cand.withColumn("hit", lit(1L)),
        Seq("doc_id_a", "doc_id_b"), "left")
      .agg(coalesce(floor(sum(coalesce(col("hit"), lit(0L))) * lit(10000)
        / count(lit(1))), lit(10000L))).head().getLong(0)
    // UNCAPPED anchored truth — the real J≥0.3 pair set. At judged SFs
    // the df cap never binds (capped ≡ uncapped, verified round 11); on
    // the synthetic salted sf1 corpus it binds hard (salt-regrouped
    // grams push shared df past 32, and removing them from both sets
    // re-weights J over the rare remainder), so the CAPPED tier
    // over-generates "true" pairs whose full-set Jaccard is below the
    // threshold. Recall floors promoted to sf1 must gate on THIS leg.
    val truthU = TextDedup.anchoredJaccardPairs(docs, truthAnchors(docs),
        "doc_id", "text", n = 3, minJ = 0.3, maxDf = None)
      .select(col("doc_id_a"), col("doc_id_b")).cache()
    val (truthUN, tTruthU) = timed(truthU.count())
    val d7bpU = truthU.join(cand.withColumn("hit", lit(1L)),
        Seq("doc_id_a", "doc_id_b"), "left")
      .agg(coalesce(floor(sum(coalesce(col("hit"), lit(0L))) * lit(10000)
        / count(lit(1))), lit(10000L))).head().getLong(0)
    // d16: true-pair co-membership in LSH-fed components vs the
    // df-capped exact-pair truth (d9's feed — the full, unanchored set)
    val exactPairs = TextDedup.exactJaccardPairs(docs, "doc_id", "text",
        n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
      .select(col("doc_id_a"), col("doc_id_b")).cache()
    val (nTrue, tExact) = timed(exactPairs.count())
    val labels = Components.connected(cand, "doc_id_a", "doc_id_b",
        vertices = Some(docs.select(col("doc_id"))), idCol = "doc_id")
      .select(col("doc_id"), col("component")).cache()
    val (_, tComp) = timed(labels.count())
    val d16bp = exactPairs
      .join(labels.select(col("doc_id").as("doc_id_a"),
        col("component").as("ca")), Seq("doc_id_a"))
      .join(labels.select(col("doc_id").as("doc_id_b"),
        col("component").as("cb")), Seq("doc_id_b"))
      .agg(coalesce(floor(sum(when(col("ca") === col("cb"), 1L)
        .otherwise(0L)) * lit(10000) / count(lit(1))), lit(10000L)))
      .head().getLong(0)
    // d16 against the uncapped truth too (co-membership of REAL pairs)
    val d16bpU = truthU
      .join(labels.select(col("doc_id").as("doc_id_a"),
        col("component").as("ca")), Seq("doc_id_a"))
      .join(labels.select(col("doc_id").as("doc_id_b"),
        col("component").as("cb")), Seq("doc_id_b"))
      .agg(coalesce(floor(sum(when(col("ca") === col("cb"), 1L)
        .otherwise(0L)) * lit(10000) / count(lit(1))), lit(10000L)))
      .head().getLong(0)
    println(s"DEDUPRECALL sf=$sfDir d7_recall_bp=$d7bp d16_recall_bp=$d16bp " +
      s"d7_recall_uncapped_bp=$d7bpU d16_recall_uncapped_bp=$d16bpU " +
      s"n_anchored_true=$truthA n_anchored_true_uncapped=$truthUN " +
      s"n_true_pairs=$nTrue n_lsh_pairs=$nLsh " +
      f"t_anchored_truth=$tTruthA%.1f t_anchored_uncapped=$tTruthU%.1f " +
      f"t_lsh=$tLsh%.1f t_exact_pairs=$tExact%.1f t_components=$tComp%.1f")
    spark.stop()
  }
}
