package graft

import org.apache.spark.sql.functions._
import graft.ext.EntityResolution

/** Blocking, scoring, and transitive resolution semantics on a
  * hand-computable fixture (the judged er1–er3 queries run the same
  * operators over the planted-dirt part fixture). */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // (rec_id, name, brand, size): 1/2 are a clean/dirty twin (one block),
  // 3 shares 1's name in ANOTHER block, 4 shares 1's block with a low-sim
  // name, 5 is a lone record, 6/7/8 share 2's... no: 6 links to 2 only
  // transitively through 1 (chain 6–1–2 via high sim both hops).
  private val recs = Seq(
    (1L, "red plate", "B1", 5),
    (2L, "red plat", "B1", 5),   // 1 deletion from rec 1 -> sim 8888
    (3L, "red plate", "B1", 7),  // other size -> other block, never paired
    (4L, "re xxxxx", "B1", 5),   // same block as 1, sim far below threshold
    (5L, "green gear", "B2", 9),
    (6L, "red plates", "B1", 5)) // 1 insertion from rec 1 -> sim 9000
    .toDF("rec_id", "name", "brand", "size")

  private val block =
    concat_ws("|", col("brand"), col("size"), substring(col("name"), 1, 2))

  test("candidates pairs records only within a block, id_a < id_b") {
    val c = EntityResolution.candidates(recs, "rec_id", block)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // block B1|5|re holds {1, 2, 4, 6}; 3 (size 7) and 5 (B2) are alone
    assert(c == Set((1L, 2L), (1L, 4L), (1L, 6L), (2L, 4L), (2L, 6L), (4L, 6L)))
  }

  test("maxBlock drops oversize blocks entirely") {
    val c = EntityResolution.candidates(recs, "rec_id", block, maxBlock = Some(3))
    assert(c.count() == 0) // the only multi-record block has 4 members
  }

  test("matchPairs scores exact normalized-Levenshtein bp and thresholds") {
    val m = EntityResolution.matchPairs(recs, "rec_id", "name", block, 8500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // lev("red plate","red plat") = 1 over max len 9 -> floor(8888.9) = 8888
    // lev("red plate","red plates") = 1 over 10 -> 9000
    // lev("red plat","red plates") = 2 over 10 -> 8000 < 8500 (dropped)
    // rec 4 scores below threshold against all three
    assert(m == Set((1L, 2L, 8888L), (1L, 6L, 9000L)))
  }

  test("fellegiSunter: per-level weights, data-derived u's, verdict bands") {
    // recs: 6 records; name counts: "red plate"×2, others ×1 ->
    // u_name = (4+1+1+1+1)/36; brand: B1×5, B2×1 -> u_brand = 26/36;
    // size: 5×4, 7×1, 9×1 -> u_size = 18/36.
    val n = 6L
    def u(num: Long) = num.toDouble / (n * n).toDouble
    def w(m: Double, uu: Double) = math.round(math.log(m / uu) * 1e6)
    val (uN, uB, uS) = (u(8), u(26), u(18))
    val wNe = w(0.70, uN); val wNn = w(0.25, 0.02)
    val wNd = w(1.0 - 0.70 - 0.25, 1.0 - uN - 0.02)
    val wBa = w(0.95, uB); val wBd = w(1.0 - 0.95, 1.0 - uB)
    val wSa = w(0.95, uS); val wSd = w(1.0 - 0.95, 1.0 - uS)
    val cand = EntityResolution.candidates(recs, "rec_id", block)
    val out = EntityResolution.fellegiSunter(recs, "rec_id", cand,
        "name", Seq("brand", "size"),
        matchMicro = wNn + wBa + wSa, // near + both agrees == match floor
        possibleMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // (1,2): near name (8888 >= 8000), brand+size agree
    assert(out((1L, 2L)) == ((wNn + wBa + wSa, "match")))
    // (1,6): near name (9000), agree, agree
    assert(out((1L, 6L)) == ((wNn + wBa + wSa, "match")))
    // (1,4): name disagrees hard (sim < 8000), brand+size agree
    assert(out((1L, 4L)) == ((wNd + wBa + wSa,
      if (wNd + wBa + wSa >= 0) "possible" else "nonmatch")))
    // all 6 block pairs scored, none beyond
    assert(out.size == 6)
  }

  test("fellegiSunter: exact-name level outranks near; null attrs compare null-safe") {
    // size varies (5,5,7): a CONSTANT field would have u = 1 and no
    // disagreement mass — fellegiSunter now fails fast on that (its old
    // disagreement weight was a silent ln(·/0) = Long.MaxValue)
    val rx = Seq(
      (1L, "same name", "B1", 5),
      (2L, "same name", "B1", 5),
      (3L, "same nam", null.asInstanceOf[String], 7))
      .toDF("rec_id", "name", "brand", "size")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = EntityResolution.fellegiSunter(rx, "rec_id", cand,
        "name", Seq("brand", "size"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact-name pair strictly outscores the near-name pair whose brand
    // leg hits the null-vs-B1 DISAGREE branch (never a null verdict)
    assert(out((1L, 2L)) > out((1L, 3L)))
    val verdicts = EntityResolution.fellegiSunter(rx, "rec_id", cand,
        "name", Seq("brand", "size"))
      .collect().map(_.getString(3))
    assert(verdicts.forall(v => Set("match", "possible", "nonmatch")(v)))
  }

  test("fellegiSunter fails fast on a near-constant field (u = 1) naming it") {
    val rx = Seq(
      (1L, "red plate", "B1", 5),
      (2L, "green gear", "B1", 7))
      .toDF("rec_id", "name", "brand", "size")
    val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      EntityResolution.fellegiSunter(rx, "rec_id", cand,
        "name", Seq("brand", "size"))
    }
    // a silent NaN->0 weight would corrupt every verdict; the require
    // must name the offending field instead
    assert(e.getMessage.contains("'brand'") || e.getMessage.contains("'size'"))
  }

  test("scorePairs excludes null/empty attributes explicitly (no null sim_bp)") {
    val rx = Seq(
      (1L, "red plate"), (2L, "red plat"),
      (3L, null.asInstanceOf[String]), (4L, ""), (5L, ""))
      .toDF("rec_id", "name")
    val cand = Seq((1L, 2L), (1L, 3L), (4L, 5L), (3L, 4L))
      .toDF("id_a", "id_b")
    val out = EntityResolution.scorePairs(rx, "rec_id", "name", cand, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only the real-string pair scores; null and empty-empty pairs are
    // excluded (no string evidence), never emitted as null rows
    assert(out.toSet == Set((1L, 2L, 8888L)))
  }

  test("candidatesTouching: exactly the pairs touching the new subset, each once") {
    // block B1|5|re = {1, 2, 4, 6}; new = {2, 6} exercises both-new
    // dedup (2,6), new-reaching-smaller-old (1,2)/(1,6), and
    // old-reaching-larger-new (2,4)/(4,6)
    val c = EntityResolution.candidatesTouching(
        recs, "rec_id", block, col("rec_id").isin(2L, 6L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(c.toSet == Set((1L, 2L), (2L, 4L), (2L, 6L), (1L, 6L), (4L, 6L)))
    assert(c.length == 5, "each pair exactly once")
  }

  test("sortedNeighborhoodCandidates: w-1 rank successors, name-tie broken by id") {
    // (name, rec_id) order: green gear(5) < re xxxxx(4) < red plat(2)
    // < red plate(1) < red plate(3) < red plates(6)
    val cand = EntityResolution.sortedNeighborhoodCandidates(
        recs, "rec_id", col("name"), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand == Set((4L, 5L), (2L, 4L), (1L, 2L), (1L, 3L), (3L, 6L)))
  }

  test("resolve closes matches transitively; singletons label themselves") {
    val pairs = EntityResolution.matchPairs(recs, "rec_id", "name", block, 8500)
    val ent = EntityResolution.resolve(recs, "rec_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 2 and 6 never matched each other directly (8000 bp) but share
    // entity 1 through the transitive closure
    assert(ent == Map(1L -> 1L, 2L -> 1L, 6L -> 1L,
      3L -> 3L, 4L -> 4L, 5L -> 5L))
  }
}
