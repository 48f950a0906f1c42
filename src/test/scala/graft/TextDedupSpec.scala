package graft

import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** Exact inverted-index Jaccard: ground truth for the MinHash path. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog today"),   // near-dup of 1
    (3L, "completely different words appear in this one text"),
    (4L, "unrelated content again with nothing shared at all"),
    (5L, "the quick brown fox jumps over the lazy dog tonight")) // exact dup of 1
    .toDF("doc_id", "text")

  test("exactJaccardPairs finds exactly the planted near/exact dups with exact J") {
    val pairs = TextDedup.exactJaccardPairs(docs, "doc_id", "text", n = 3, minJ = 0.3)
      .orderBy("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 8 shingles each; docs 1/2 share 7 of 8 -> J = 7/9; 1/5 identical -> J = 1
    assert(pairs.toSeq == Seq(
      (1L, 2L, math.floor(7.0 / 9.0 * 10000).toLong),
      (1L, 5L, 10000L),
      (2L, 5L, math.floor(7.0 / 9.0 * 10000).toLong)))
  }

  test("exactJaccardPairs agrees with the pairwise jaccard() on its pairs") {
    val sh = docs.select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("sh"))
    val direct = sh.select(col("doc_id").as("a"), col("sh").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("sb")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        floor(TextDedup.jaccard(col("sa"), col("sb")) * 10000).as("bp"))
      .filter(col("bp") >= 3000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val indexed = TextDedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == direct)
  }

  test("anchoredJaccardPairs == exact pairs touching the anchors, each once") {
    // anchors {2, 5}: pair (2,5) has BOTH endpoints anchored (the
    // double-count dedup path), (1,2)/(1,5) reach the anchor from the
    // LARGER side (a > b, b non-anchor), and nothing invents pairs the
    // full verifier lacks
    val anchors = Seq(2L, 5L).toDF("doc_id")
    val expect = TextDedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .filter(col("doc_id_a").isin(2L, 5L) || col("doc_id_b").isin(2L, 5L))
      .orderBy("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val anchored = TextDedup.anchoredJaccardPairs(docs, anchors, "doc_id", "text", 3, 0.3)
      .orderBy("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(anchored.toSeq == expect.toSeq && anchored.length == 3)
  }

  test("anchoredJaccardPairs excludes pairs not touching any anchor") {
    val anchors = Seq(1L).toDF("doc_id")
    val anchored = TextDedup.anchoredJaccardPairs(docs, anchors, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,5) is a true near-dup pair but touches no anchor
    assert(anchored == Set((1L, 2L), (1L, 5L)))
  }

  test("anchoredJaccardPairs with anchors == all docs is identical to exactJaccardPairs (df-capped)") {
    val a = TextDedup.anchoredJaccardPairs(docs, docs.select("doc_id"),
        "doc_id", "text", 3, 0.3, maxDf = Some(32))
      .orderBy("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e = TextDedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.3, maxDf = Some(32))
      .orderBy("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == e.toSeq)
  }

  test("duplicateSpans merges adjacent duplicated k-gram starts into maximal spans") {
    val spanDocs = Seq(
      (1L, "a b c d e f g h"),     // shares "c d e","d e f" with doc 2
      (2L, "x y c d e f z w"),
      (3L, "p q r s p q r s"),     // self-repeat: two islands
      (4L, "k l m n o u v q"),     // all grams unique -> no rows
      (5L, "a b"))                 // < k tokens -> no grams
      .toDF("doc_id", "text")
    val spans = TextDedup.duplicateSpans(spanDocs, "doc_id", "text", k = 3, minOcc = 2)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (1L, 2L, 5L, 2L),   // grams at pos 2,3 cover tokens 2..5
      (2L, 2L, 5L, 2L),
      (3L, 0L, 3L, 2L),   // "p q r","q r s" at pos 0,1
      (3L, 4L, 7L, 2L)))  // same grams again at pos 4,5 — separate island
  }

  test("removeDuplicateSpans cuts covered tokens, passes clean docs through") {
    val spanDocs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y c d e f z w"),
      (3L, "p q r s p q r s"),     // everything covered -> empty doc
      (4L, "k l m n o u v q"),
      (5L, "a b"))
      .toDF("doc_id", "text")
    val out = TextDedup.removeDuplicateSpans(spanDocs, "doc_id", "text", k = 3, minOcc = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "a b g h", 4L),
      (2L, "x y z w", 4L),
      (3L, "", 8L),
      (4L, "k l m n o u v q", 0L),
      (5L, "a b", 0L)))
  }

  test("maxDf computes df-filtered Jaccard: rare-shingle space, sizes included") {
    // cap above the duplicate-cluster size (3): nothing filtered that the
    // J>=0.3 pairs rely on -> identical pair set
    val roomy = TextDedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.3, maxDf = Some(3))
    assert(roomy.count() == 3)
    // cap = 2 drops the df=3 family shingles shared by docs 1/2/5; in the
    // REMAINING (rare) shingle space docs 1 and 5 are still identical
    // ('lazy dog tonight', df=2) -> J=1.0 survives, while doc 2's rare
    // tail ('lazy dog today') shares nothing -> its pairs vanish. Sizes
    // are computed in the same filtered space, so the surviving pair is
    // exact, not understated against unfiltered set sizes.
    val capped = TextDedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.3, maxDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq == Seq((1L, 5L, 10000L)), capped.mkString(","))
  }

  test("withShingles loan: block manager clean on exit, no caller bookkeeping") {
    TextDedup.releaseShingles() // start clean whatever earlier tests did
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val n = TextDedup.withShingles {
      // two consumers sharing the session cache inside the loan
      TextDedup.nearDuplicates(docs, "doc_id", "text", 0.3).count() +
        TextDedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.3).count()
    }
    assert(n > 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the loan must release every shingle cache it installed")
    // release is idempotent, and the loan releases on FAILURE too
    TextDedup.releaseShingles()
    intercept[RuntimeException] {
      TextDedup.withShingles {
        TextDedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.3).count()
        throw new RuntimeException("boom")
      }
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "a throwing body must still release the loan")
  }

  test("dedupSegments: repeated segment cut everywhere but its (doc,pos)-first; clean docs pass") {
    // segWords=3: doc 10 = [A B C][D E F], doc 20 = [A B C][X Y Z],
    // doc 30 = [P Q R][A B C] — "A B C" appears in 3 docs; keeper is
    // (10, 0). doc 40 shares nothing.
    val d = Seq(
      (10L, "A B C D E F"),
      (20L, "A B C X Y Z"),
      (30L, "P Q R A B C"),
      (40L, "U V W")).toDF("doc_id", "text")
    val out = TextDedup.dedupSegments(d, "doc_id", "text", segWords = 3, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((10L, 2L, 2L, "A B C D E F")), s"keeper doc intact: ${out(0)}")
    assert(out(1) == ((20L, 2L, 1L, "X Y Z")), s"later copy cut: ${out(1)}")
    assert(out(2) == ((30L, 2L, 1L, "P Q R")), s"mid-doc copy cut: ${out(2)}")
    assert(out(3) == ((40L, 1L, 1L, "U V W")), s"clean doc untouched: ${out(3)}")
  }

  test("LSH bucket cap: capped == uncapped candidate set when no bucket exceeds the cap") {
    val capped = TextDedup.lshCandidates(docs, "doc_id", "text", cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = TextDedup.lshCandidates(docs, "doc_id", "text", cache = false,
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped && capped.nonEmpty)
  }

  test("LSH bucket cap binds on a planted mega-cluster: star pairs, not bucket²") {
    // 600 byte-identical docs -> identical signatures -> every band is one
    // 600-doc bucket. Uncapped enumerates the full quadratic pair set;
    // the cap's star fallback emits exactly n-1 hub pairs.
    val txt = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = (1L to 600L).map(i => (i, txt)).toDF("doc_id", "text")
    val before = TextDedup.lshCandidates(d, "doc_id", "text", cache = false,
      maxBucket = Int.MaxValue).count()
    val after = TextDedup.lshCandidates(d, "doc_id", "text", cache = false).count()
    assert(before == 600L * 599 / 2, s"uncapped pair volume: $before")
    assert(after == 599L, s"capped star pair volume: $after")
  }

  test("LSH bucket cap preserves mega-cluster connectivity end to end (5k docs)") {
    // the VERDICT-r13 adversarial shape: a near-identical boilerplate
    // mega-cluster (5000 docs, 5 variants of a 40-token boilerplate).
    // The cap must bind (linear candidates) AND the verified pairs must
    // still resolve the cluster to a handful of components (exact-variant
    // groups at worst, one cluster when variants share buckets) — the
    // property d16's clustering act needs from the shipped path.
    val boiler = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mega = (1L to 5000L).map(i => (i, s"$boiler variant${i % 5}"))
    val clean = Seq(
      (90001L, "totally different content one two three four five six"),
      (90002L, "another unrelated document body seven eight nine ten"))
    val d = spark.createDataFrame(mega ++ clean).toDF("doc_id", "text")
    val nCand = TextDedup.lshCandidates(d, "doc_id", "text", cache = false).count()
    // uncapped would enumerate ~C(1000,2)·5 ≈ 2.5M intra-variant pairs at
    // minimum; the star fallback keeps the feed linear in corpus size
    assert(nCand <= 8L * 5002L, s"cap must bind: $nCand candidates")
    assert(nCand >= 4995L, "every mega-cluster member must reach a hub")
    val ver = TextDedup.nearDuplicates(d, "doc_id", "text", 0.5, cache = false)
      .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"))
    val comps = graft.ops.Components.connected(ver, "doc_id_a", "doc_id_b",
        vertices = Some(d.select(col("doc_id"))), idCol = "doc_id")
      .filter(col("doc_id") <= 5000L)
      .select("component").distinct().count()
    assert(comps <= 5L, s"mega-cluster must not fragment past variant groups: $comps")
  }

  test("dedupSegments: within-doc repetition counts one doc — below minDocs it survives") {
    val d = Seq(
      (1L, "A B C A B C"), // same segment twice in ONE doc
      (2L, "M N O P Q R")).toDF("doc_id", "text")
    val out = TextDedup.dedupSegments(d, "doc_id", "text", segWords = 3, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 2L && out(0).getString(3) == "A B C A B C",
      "distinct-doc census must not count within-doc repeats")
  }

  test("suffixDupPow: minPow rung == the gram method's position set; long blocks grade past any gram budget") {
    // two docs share a 40-token block; one pair shares only an 8-token
    // run; one doc is clean. ux/vx prefixes keep tokens collision-free.
    val blk40 = (0 until 40).map("ux" + _).mkString(" ")
    val run8 = (0 until 8).map("vx" + _).mkString(" ")
    val fix = Seq(
      (1L, s"alpha beta $blk40 gamma"),
      (2L, s"delta $blk40 epsilon zeta"),
      (3L, s"one two $run8 three"),
      (4L, s"$run8 four five six"),
      (5L, "nothing here repeats anywhere at all in this doc")
    ).toDF("doc_id", "text")
    val out = TextDedup.suffixDupPow(fix, "doc_id", "text",
      maxPow = 64, minOcc = 2, minPow = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // claim 2: the 40-token block grades to dup_pow 32 (> a 13-gram
    // budget) at its aligned starts, and NOTHING reaches 64
    assert(out((1L, 2L)) == 32L, s"doc1 block start: ${out.get((1L, 2L))}")
    assert(out((2L, 1L)) == 32L)
    assert(out.valuesIterator.max == 32L)
    // the 8-token run grades exactly 8, never 16
    assert(out((3L, 2L)) == 8L && out((4L, 0L)) == 8L)
    // claim 1: the dup_pow >= 8 position set == the FIXED 8-gram dup set
    val gram8 = fix.select(col("doc_id"),
        posexplode(graft.functions.VectorExpressions.gramHash64(col("text"), 8))
          .as(Seq("pos", "g")))
    val dupG = gram8.groupBy("g").count().filter(col("count") >= 2).select("g")
    val gramSet = gram8.join(dupG, Seq("g"), "left_semi")
      .select("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    assert(out.keySet == gramSet,
      "suffix ladder rung 8 must flag exactly the gram method's positions")
    // doc 5 contributes nothing
    assert(!out.keys.exists(_._1 == 5L))
  }
}
