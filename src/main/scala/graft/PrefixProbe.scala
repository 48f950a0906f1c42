package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** Dev probe: size the exact-Jaccard candidate space at a given SF —
  * full inverted-index pair volume (Σ bucket²) vs the prefix-filtered
  * volume, and the distinct candidate count the verify join would carry.
  * Usage: runMain graft.PrefixProbe [sfDir] [minJ]
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val minJ = if (args.length > 1) args(1).toDouble else 0.3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val hashed = docs.select(col("doc_id"),
      graft.functions.VectorExpressions.shingleHash64(col("text"), 3).as("hh"))
    hashed.persist()
    val sh = hashed.select(col("doc_id"), explode(col("hh")).as("s"))
    println(s"docs=${docs.count()} shingleRows=${sh.count()}")

    def sumSq(buckets: org.apache.spark.sql.DataFrame): Long =
      buckets.groupBy("s").agg(count(lit(1)).as("b"))
        .agg(sum(col("b") * (col("b") - 1) / 2)).collect()(0).getAs[Any](0) match {
          case d: java.math.BigDecimal => d.longValue()
          case l: Long => l
          case x => x.toString.toDouble.toLong
        }
    println(s"full pairs (sum b*(b-1)/2) = ${sumSq(sh)}")

    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val docArr = sh.join(dfreq, Seq("s"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ds"))
      .select(col("doc_id"),
        transform(col("ds"), x => x.getField("s")).as("ss"),
        size(col("ds")).cast("long").as("sz"))
    docArr.persist()
    val beta = minJ / (1.0 + minJ)
    val prefLen = (col("sz") - ceil(col("sz") * lit(beta) - lit(1e-9)) + lit(1)).cast("int")
    val pref = docArr.select(col("doc_id"), col("sz"),
      explode(slice(col("ss"), lit(1), prefLen)).as("s"))
    pref.persist()
    println(s"prefix rows = ${pref.count()}")
    println(s"prefix pairs (sum b*(b-1)/2) = ${sumSq(pref)}")
    val t0 = System.nanoTime()
    val cand = pref.select(col("doc_id").as("doc_id_a"), col("sz").as("na"), col("s"))
      .join(pref.select(col("doc_id").as("doc_id_b"), col("sz").as("nb"), col("s")), Seq("s"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(minJ) * greatest(col("na"), col("nb")).cast("double") - lit(1e-9))
      .select("doc_id_a", "doc_id_b").distinct()
    println(f"distinct candidates = ${cand.count()} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
