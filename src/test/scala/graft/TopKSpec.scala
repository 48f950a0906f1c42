package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext.Similarity
import graft.functions.TopKAggregate

/** The bounded top-k aggregate must be BIT-IDENTICAL to the window
  * formulation it replaced (row_number over sim desc, id asc) — including
  * NaN placement (Double.compare: NaN above +Inf) and equal-score
  * tie-breaks — because the e1 oracle hash was green under the window
  * form. */
class TopKSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("knnBrute via topk aggregate == window formulation") {
    val emb = Tables.load(spark, sf, "embeddings")
    val a = emb.select(col("vec_id"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"))
    val pairs = a.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("va"), col("vb")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id"))
    val windowed = pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"))
    val agg = Similarity.knnBrute(emb, "vec_id", "embedding", k = 3)
    assert(agg.exceptAll(windowed).isEmpty && windowed.exceptAll(agg).isEmpty,
      "aggregate and window top-3 differ")
  }

  test("ties, NaN, and null sims order exactly as the window form") {
    import spark.implicits._
    // scores: NaN must outrank +Inf; equal scores break by id asc; null
    // sims rank LAST (desc NULLS LAST) but are still emitted when the
    // group has fewer than k non-null candidates (group 3).
    val rows = Seq(
      (1L, 10L, Some(Double.NaN)), (1L, 11L, Some(Double.PositiveInfinity)),
      (1L, 12L, Some(5.0)), (1L, 13L, Some(5.0)), (1L, 14L, Some(-0.0)), (1L, 15L, Some(0.0)),
      (2L, 20L, Some(1.0)), (2L, 21L, Some(1.0)), (2L, 22L, Some(1.0)), (2L, 23L, Some(2.0)),
      (3L, 30L, Some(0.5)), (3L, 31L, None), (3L, 32L, None), (3L, 33L, None))
      .toDF("vec_id", "neighbor_id", "sim")
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id"))
    val windowed = rows
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val agg = rows.groupBy(col("vec_id"))
      .agg(TopKAggregate.topkIdsBy(col("sim"), col("neighbor_id"), 3).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "neighbor_id")))
      .select(col("vec_id"), col("neighbor_id"), (col("pos") + 1).cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg == windowed, s"agg=$agg windowed=$windowed")
  }

  test("partial merge across many partitions matches single-partition run") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => ((i % 7).toLong, i.toLong, (i * 37 % 101).toDouble))
      .toDF("g", "id", "s")
    def topk(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("g"))
      .agg(TopKAggregate.topkIdsBy(col("s"), col("id"), 5).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(topk(rows.repartition(13)) == topk(rows.coalesce(1)))
  }
}
