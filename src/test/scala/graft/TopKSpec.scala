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

  // ---- Misra-Gries heavy hitters (functions.HeavyHitters) ----

  test("mg_topk: MG guarantees hold on a skewed stream at any partitioning") {
    import graft.functions.HeavyHitters
    import spark.implicits._
    // zipf-ish synthetic stream: term t_i appears ~N/i times; deterministic
    val rows = (1 to 60).flatMap(i => Seq.fill(3000 / i)(s"t$i"))
    val n = rows.length.toLong
    val budget = 16
    for (parts <- Seq(1, 7)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("term")
      val sk = df.agg(HeavyHitters.mgTopK(col("term"), budget).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term").as("term"), col("e.est").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.size <= budget, s"summary must hold <= budget entries, got ${sk.size}")
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // every estimate is a lower bound within n/(budget+1)
      for ((t, est) <- sk) {
        val truth = exact(t)
        assert(est <= truth, s"$t: est $est above truth $truth")
        assert((truth - est) * (budget + 1) <= n,
          s"$t: error ${truth - est} beyond n/(B+1)")
      }
      // every guaranteed-heavy term is present
      for ((t, c) <- exact if c * (budget + 1) > n)
        assert(sk.contains(t), s"guaranteed-heavy $t (cnt $c) missing at parts=$parts")
    }
  }

  test("mg_topk registers for SQL text with a literal budget") {
    import spark.implicits._
    graft.functions.HeavyHitters.register(spark)
    Seq("a", "a", "a", "b").toDF("term").createOrReplaceTempView("mg_in")
    val out = spark.sql(
      "SELECT mg_topk(term, 2) AS sk FROM mg_in")
      .select(explode(col("sk")).as("e")).select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 3L, s"undisturbed stream: exact count expected, got $out")
  }
}
