package graft

import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextDedup}
import graft.functions.VectorExpressions

/** The compiled Catalyst kernels must produce bit-identical results to the
  * portable HOF formulations they replace (same element order, same double
  * widening) — otherwise oracle hashes would drift between code paths. */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f, -0.5f)),
    (2L, Array(0.25f, -4.0f, 0.0f, 2.5f)),
    (3L, Array(1e-3f, 7.5f, 2.25f, 1.0f))
  ).toDF("id", "v")

  test("vecDot matches HOF dot bit-for-bit on float arrays") {
    val a = vecs.select(col("id"), col("v").as("va"))
    val b = vecs.select(col("id").as("id2"), col("v").as("vb"))
    val pairs = a.crossJoin(b)
    val rows = pairs.select(
      Similarity.dotHof(col("va"), col("vb")).as("hof"),
      VectorExpressions.vecDot(col("va"), col("vb")).as("gen")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("vecCosine matches dot/(norm*norm) composition bit-for-bit") {
    val a = vecs.select(col("id"), col("v").as("va"))
    val b = vecs.select(col("id").as("id2"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("id") =!= col("id2"))
    val composed = Similarity.dotHof(col("va"), col("vb")) /
      (sqrt(Similarity.dotHof(col("va"), col("va"))) * sqrt(Similarity.dotHof(col("vb"), col("vb"))))
    val rows = pairs.select(
      composed.as("hof"),
      VectorExpressions.vecCosine(col("va"), col("vb")).as("gen")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("vecDot null-element and null-array handling") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0, 1.0)))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.vecDot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }

  test("minhashSig matches the HOF minhash signature exactly") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "")).toDF("id", "text")
    val hashes = TextDedup.shingleHashes(TextDedup.shingles(col("text"), 3))
    val rows = docs.select(
      TextDedup.minhashSignatureHof(hashes, k = 16).as("hof"),
      TextDedup.minhashSignature(hashes, k = 16).as("gen")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("shingleHash64 matches HOF shingles->hashes as a set") {
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b"),             // fewer tokens than n -> single shingle
      (3L, ""),
      (4L, "  x   y  z "),     // irregular whitespace
      (5L, "r r r r r")).toDF("id", "text")  // repeated shingles dedupe
    val rows = docs.select(
      TextDedup.shingleHashes(TextDedup.shingles(col("text"), 3)).as("hof"),
      VectorExpressions.shingleHash64(col("text"), 3).as("gen")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet == r.getSeq[Long](1).toSet)
      assert(r.getSeq[Long](1).distinct.size == r.getSeq[Long](1).size)
    }
  }

  test("gramHash64 matches HOF positional grams; short docs yield empty") {
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b"),             // fewer tokens than n -> NO gram (unlike shingles)
      (3L, ""),
      (4L, "  x   y  z "),     // irregular whitespace
      (5L, "r r r r r")).toDF("id", "text")  // repeats preserved, in order
    val toks = split(trim(col("text")), "\\s+")
    val hof = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - lit(3)),
        i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(3))))))
      .otherwise(array().cast("array<bigint>"))
    val rows = docs.select(hof.as("hof"),
      VectorExpressions.gramHash64(col("text"), 3).as("gen")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    assert(rows(4).getSeq[Long](1).size == 3) // positional: dups NOT deduped
  }

  test("simhash compiled matches the HOF simhash") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox jumps"),
      (3L, "completely different words here"),
      (4L, "")).toDF("id", "text")
    val rows = docs.select(
      TextDedup.simhashHof(col("text")).as("hof"),
      TextDedup.simhash(col("text")).as("gen")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("expressions survive both codegen and interpreted paths") {
    // force interpreted eval by constant-folding context: literal inputs
    val row = spark.sql(
      "SELECT 1").select(
      VectorExpressions.vecDot(
        array(lit(1.0f), lit(2.0f)), array(lit(3.0f), lit(4.0f))).as("d")).collect()
    assert(row(0).getDouble(0) == 11.0)
  }

  test("sql registration makes vec_cosine callable from SQL text") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
  }
}
