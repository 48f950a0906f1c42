package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.functions.TextExpressions

/** PII redaction and Unicode normalization — the curation steps the gated
  * t7/t8 queries drive over (mostly PII-free, already-NFC) corpus data;
  * these fixtures exercise the non-trivial paths. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs emails, SSNs, phones; counts match placeholders") {
    val df = Seq(
      (1L, "contact a.smith+x@lab.example.org today"),
      (2L, "ssn 123-45-6789 and phone (555) 123-4567 and 555.123.4567"),
      (3L, "digits 12345 and dash 12-34 stay; user@host too"),
      (4L, "clean text, nothing to redact"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.redactPii(col("text")).as("t"),
        TextAnalysis.piiHits(col("text")).as("hits"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(df(1L) == ("contact <EMAIL> today", 1L))
    assert(df(2L) == ("ssn <SSN> and phone <PHONE> and <PHONE>", 3L))
    // 'user@host' has no dotted TLD -> NOT an email by the explicit pattern
    assert(df(3L) == ("digits 12345 and dash 12-34 stay; user@host too", 0L))
    assert(df(4L)._2 == 0L)
  }

  test("phone formats without separators or with spaces are redacted") {
    val out = Seq(
      (1L, "call (555)123-4567 now"),
      (2L, "or 555 123 4567 later"),
      (3L, "bare 5551234567 stays"))          // no separator at all: kept
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.redactPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "call <PHONE> now")
    assert(out(2L) == "or <PHONE> later")
    assert(out(3L) == "bare 5551234567 stays")
  }

  test("piiHits counts actual redactions, not pre-existing placeholder tokens") {
    val hits = Seq("replace <EMAIL> with the user address, e.g. a@b.org")
      .toDF("text").select(TextAnalysis.piiHits(col("text"))).head().getLong(0)
    assert(hits == 1L) // only the real address counts
  }

  test("email rule wins over phone rule inside an address") {
    val r = Seq("reach 555 123-4567@mail.example.com now").toDF("text")
      .select(TextAnalysis.redactPii(col("text"))).head().getString(0)
    // the digit run is part of the address; email redaction consumed it
    assert(r == "reach 555 <EMAIL> now", r)
  }

  test("hashSplit: deterministic, partition-independent, near the target fractions") {
    val docs = (1L to 2000L).toDF("id")
    def dist(df: org.apache.spark.sql.DataFrame) = df
      .select(graft.ext.TextAnalysis.hashSplit(col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d1 = dist(docs.repartition(7))
    assert(d1 == dist(docs.coalesce(1)), "split depends on partitioning")
    assert(d1.values.sum == 2000 && d1.keySet == Set("train", "val", "test"))
    // md5 is uniform: 80/10/10 within a few percent at n=2000
    assert(math.abs(d1("train") - 1600) < 100, d1.toString)
    assert(math.abs(d1("val") - 200) < 60 && math.abs(d1("test") - 200) < 60, d1.toString)
    // a key's split never changes when the corpus around it changes
    val one = dist(Seq(42L).toDF("id")).keys.head
    assert(dist((1L to 500L).toDF("id").filter(col("id") === 42)).keys.head == one)
  }

  test("sampleKPerStratum: exact k per stratum, deterministic across partitionings") {
    val docs = (1L to 100L).map(i => (i, if (i % 3 == 0) "en" else "fr")).toDF("doc_id", "lang")
    val a = TextAnalysis.sampleKPerStratum(docs, "lang", "doc_id", k = 5)
      .select("doc_id", "lang", "sample_rank").as[(Long, String, Long)].collect().sorted.toSeq
    val b = TextAnalysis.sampleKPerStratum(docs.repartition(7), "lang", "doc_id", k = 5)
      .select("doc_id", "lang", "sample_rank").as[(Long, String, Long)].collect().sorted.toSeq
    assert(a == b) // membership is content-addressed, not partition-dependent
    assert(a.count(_._2 == "en") == 5 && a.count(_._2 == "fr") == 5)
    assert(a.filter(_._2 == "en").map(_._3).sorted == Seq(1L, 2L, 3L, 4L, 5L))
    // k larger than a stratum keeps the whole stratum
    val small = TextAnalysis.sampleKPerStratum(docs.filter($"doc_id" <= 4), "lang", "doc_id", 99)
    assert(small.count() == 4)
  }

  test("temperatureSample: T=1 keeps proportions, higher T flattens, draw is stable") {
    // 80 en / 20 fr
    val docs = (1L to 100L).map(i => (i, if (i <= 80) "en" else "fr")).toDF("doc_id", "lang")
    def quotas(t: Double) =
      TextAnalysis.temperatureSample(docs, "lang", "doc_id", targetTotal = 50L, t)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
    val q1 = quotas(1.0)
    assert(q1 == Map("en" -> 40L, "fr" -> 10L)) // natural 80/20 of 50
    val q4 = quotas(4.0)
    assert(q4("fr") > 10L && q4("en") < 40L) // flattened toward uniform
    assert(q4.values.sum <= 50L)
    // membership is partition-independent (content-addressed draw)
    val a = TextAnalysis.temperatureSample(docs, "lang", "doc_id", 50L, 2.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = TextAnalysis.temperatureSample(docs.repartition(7), "lang", "doc_id", 50L, 2.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("bigramLmScore: closed-form Stupid Backoff — seen branch, backoff branch, empty docs") {
    // train: "a b a" + "a b c" -> uni a:3 b:2 c:1 (N=6, V=3);
    //        bigrams (a,b):2 (b,a):1 (b,c):1
    val train = Seq((0L, "a b a"), (2L, "a b c")).toDF("doc_id", "text")
    // score doc 1 "a b x": (a,b) seen -> p = 2/3; (b,x) unseen, x not in
    // train -> p = 0.4*(0+1)/9. doc 3 has one token (no bigram), doc 5 is
    // whitespace-only (split -> [""], no bigram) — both emit (0, 0).
    val score = Seq((1L, "a b x"), (3L, "z"), (5L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m1 = math.round(math.log(2.0 / 3.0) * 1e6)          // -405465
    val m2 = math.round(math.log(0.4 * 1 / 9.0) * 1e6)      // -3113515
    assert(m1 == -405465L && m2 == -3113515L)
    assert(out(1L) == ((2L, m1 + m2)))
    assert(out(3L) == ((0L, 0L)))
    assert(out(5L) == ((0L, 0L)))
  }

  test("bigramLmScore is partitioning-independent (fixed-point before sum)") {
    val docs = (0L until 40L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} common word"))
      .toDF("doc_id", "text")
    val tr = docs.filter(col("doc_id") % 2 === 0)
    val sc = docs.filter(col("doc_id") % 2 === 1)
    val one = TextAnalysis.bigramLmScore(tr.coalesce(1), sc.coalesce(1),
      "doc_id", "text").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val many = TextAnalysis.bigramLmScore(tr.repartition(13), sc.repartition(7),
      "doc_id", "text").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == many && one.size == 20)
  }

  test("tokenBudgetSample: exact integer budgets, exclusion, zero-rounded budget, draw parity") {
    // T=9 tokens; budget 5000bp -> B = 9*5000 div 10000 = 4.
    // en: share 8000 -> B_en = 3, T_en = 6 -> keep iff draw*6 < 3*2^48
    //     i.e. draw < 2^47 exactly.
    // de: share 2000 -> B_de = (4*2000) div 10000 = 0 -> nothing kept.
    // fr: no share -> excluded.
    val docs = Seq((1L, "en", "a b c d"), (2L, "en", "a b"),
      (3L, "de", "x y"), (4L, "fr", "z")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenBudgetSample(docs, "doc_id", "text", "lang",
        budgetBp = 5000, sharesBp = Seq("en" -> 8000, "de" -> 2000))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    def draw(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    assert(out(1L) == ((4L, if (draw(1L) < (1L << 47)) 1L else 0L)))
    assert(out(2L) == ((2L, if (draw(2L) < (1L << 47)) 1L else 0L)))
    assert(out(3L) == ((2L, 0L)))   // budget rounds to zero
    assert(out(4L) == ((1L, 0L)))   // excluded category
    val again = TextAnalysis.tokenBudgetSample(docs.repartition(5),
        "doc_id", "text", "lang", 5000, Seq("en" -> 8000, "de" -> 2000))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("unigramLogProb: uniform corpus scores ln(c/total); rare-token docs score lower") {
    // corpus term counts: a=4 (3 in doc1, 1 in doc4), b=2, c=2 -> total 8
    val docs = Seq((1L, "a a a"), (2L, "b b"), (3L, "c"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == (3L, r6(math.log(4.0 / 8))))
    assert(out(3L) == (1L, r6(math.log(2.0 / 8))))
    assert(out(4L) == (2L, r6((math.log(4.0 / 8) + math.log(2.0 / 8)) / 2)))
    assert(out(3L)._2 < out(1L)._2) // rare-token doc scores lower
  }

  test("nfcNormalize composes decomposed forms; already-NFC strings pass through") {
    val decomposed = "Café mañana" // e+́ , n+̃
    val composed = "Café mañana"
    val rows = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), TextExpressions.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == composed)
    assert(rows(2L) == composed)
    assert(rows(3L) == "plain ascii")
    // SQL surface and DataFrame agree
    GraftSession.registerAll(spark)
    val viaSql = spark.sql(s"SELECT nfc_normalize('Café')").head().getString(0)
    assert(viaSql == "Café")
  }

  test("weightedSample: exact k, deterministic, heavier rows oversampled") {
    import graft.ext.TextAnalysis
    // two weight classes: 100 ids at weight 1, 100 ids at weight 9
    val df = ((1L to 100L).map((_, 1L)) ++ (101L to 200L).map((_, 9L)))
      .toDF("id", "w")
    val s1 = TextAnalysis.weightedSample(df, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(s1.size == 50)
    val s2 = TextAnalysis.weightedSample(df.repartition(7), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "draw must be partition-independent")
    // E-S property: the heavy class (90% of the mass) dominates the sample
    val heavy = s1.count(_ > 100L)
    assert(heavy > 30, s"heavy-weight rows undersampled: $heavy/50")
    // zero/negative weights are excluded, never auto-selected
    val withZero = df.union(Seq((999L, 0L)).toDF("id", "w"))
    val s3 = TextAnalysis.weightedSample(withZero, "id", "w", k = 201)
      .select("id").as[Long].collect().toSet
    assert(!s3.contains(999L) && s3.size == 200)
  }

  test("char_entropy kernel == aggregate reference == SQL surface") {
    val rnd = new scala.util.Random(99L)
    val docs = (1L to 25L).map { i =>
      (i, Seq.fill(rnd.nextInt(120) + 1)("abcxyz 09"(rnd.nextInt(9))).mkString)
    }.toDF("id", "txt")
    val viaAgg = TextAnalysis.charEntropy(docs, "id", "txt")
      .select("id", "entropy").as[(Long, Double)].collect().toMap
    val viaKernel = docs.select(col("id"),
        TextExpressions.charEntropy(col("txt")).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(viaKernel == viaAgg)
    GraftSession.registerAll(spark)
    docs.createOrReplaceTempView("ce_docs")
    val viaSql = spark.sql("SELECT id, char_entropy(txt) FROM ce_docs")
      .as[(Long, Double)].collect().toMap
    assert(viaSql == viaAgg)
    // null/empty semantics: NULL in → NULL; "" → NULL (no distribution)
    val edge = Seq((1L, Option.empty[String]), (2L, Some(""))).toDF("id", "txt")
      .select(TextExpressions.charEntropy(col("txt"))).collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("charEntropy matches a sequential reference on 30 randomized docs") {
    val rnd = new scala.util.Random(20260812L)
    val docs = (1L to 30L).map { i =>
      val len = rnd.nextInt(200) + 1
      val alpha = "abcdef 123"
      (i, Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val expected = docs.map { case (i, s) =>
      val counts = s.groupBy(identity).map(_._2.length.toDouble)
      val n = s.length.toDouble
      val h = math.log(n) - counts.map(c => c * math.log(c)).sum / n
      i -> (s.length.toLong, math.rint(h * 1e6) / 1e6)
    }.toMap
    val got = TextAnalysis.charEntropy(docs.toDF("id", "txt"), "id", "txt")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("weightedSample matches the sequential Efraimidis-Spirakis reference") {
    val rnd = new scala.util.Random(7L)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(50).toLong + 1))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = rows.map { case (id, w) =>
      val u = (java.lang.Long.parseLong(md5hex(s"ws:$id").take(12), 16) + 1.0) / 281474976710656.0
      val key = math.rint(-math.log(u) / w * 1e9) / 1e9
      (key, id)
    }.sorted.take(40).map(_._2).toSet
    val got = TextAnalysis.weightedSample(rows.toDF("id", "w"), "id", "w", k = 40)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("chunkDocs: stride boundaries, tail chunk, and content-address md5") {
    import graft.ext.TextAnalysis
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, ten), (2L, "solo")).toDF("doc_id", "text")
    // chunkSize=4, overlap=1 -> stride 3: starts 0,3,6,9
    val got = TextAnalysis.chunkDocs(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val toks = ten.split(" ")
    val exp = Seq(0, 3, 6, 9).zipWithIndex.map { case (s0, i) =>
      val slice = toks.slice(s0, s0 + 4)
      (1L, i.toLong, slice.length.toLong, md5hex(slice.mkString(" ")))
    } :+ ((2L, 0L, 1L, md5hex("solo")))
    assert(got.toSeq == exp)
  }

  test("charEntropy: single-char doc is zero, uniform alphabet hits ln(n)") {
    import graft.ext.TextAnalysis
    val docs = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aabb")).toDF("id", "txt")
    val out = TextAnalysis.charEntropy(docs, "id", "txt")
      .orderBy("id").collect()
    assert(out(0).getDouble(2) == 0.0)
    assert(math.abs(out(1).getDouble(2) - math.log(4)) < 1e-6)
    assert(math.abs(out(2).getDouble(2) - math.log(2)) < 1e-6)
    assert(out.forall(_.getLong(1) == 4L))
  }

  test("mixtureSample: exact deterministic draw, saturation, exclusion") {
    import graft.ext.TextAnalysis
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    // independent replication of the content-addressed Bernoulli draw
    def u48(key: String): Double =
      (BigInt(md5hex(s"mix:$key").take(12), 16).toDouble + 1) / 281474976710656.0
    val docs = ((1 to 60).map(i => (i.toLong, "en")) ++
      (61 to 70).map(i => (i.toLong, "de")) ++       // small cat, over-asked
      (71 to 90).map(i => (i.toLong, "zz"))          // not in shares
      ).toDF("doc_id", "lang")
    val shares = Map("en" -> 0.5, "de" -> 0.5)
    val total = 40L
    val got = TextAnalysis.mixtureSample(docs, "lang", "doc_id", shares, total)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val counts = Map("en" -> 60L, "de" -> 10L)
    val expected = (1 to 70).flatMap { i =>
      val lang = if (i <= 60) "en" else "de"
      val r = math.min(1.0, shares(lang) * total / counts(lang))
      if (u48(i.toString) <= r) Some((lang, i.toLong)) else None
    }.toSet
    assert(got == expected)
    // de over-asked (0.5*40=20 > 10): saturated -> whole category kept
    assert((61 to 70).forall(i => got(("de", i.toLong))))
    // zz excluded entirely; en thinned to ~20
    assert(!got.exists(_._1 == "zz"))
    val en = got.count(_._1 == "en")
    assert(en > 8 && en < 32, s"en=$en far from its 20-doc quota")
  }

  test("classifierScore: mean-pooled bp logit, repeats count, case folded") {
    import graft.ext.TextAnalysis
    val vocab = Map("good" -> 100L, "bad" -> -200L)
    val docs = Seq(
      (1L, "good good bad x"), // sum 0 over 4 toks -> floor(0/4)=0
      (2L, "GOOD"),            // case-folds: floor(100/1)=100
      (3L, "bad"),             // floor(-200/1)=-200
      (4L, "x y z"),           // no vocab hits -> 0
      (5L, "bad x")            // floor(-200/2)=-100
    ).toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(docs, "doc_id", "text",
        vocab, biasBp = 10L, keepBp = 0L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 10L, 1), (2L, 1L, 110L, 1), (3L, 1L, -190L, 0),
      (4L, 3L, 10L, 1), (5L, 2L, -90L, 0)))
  }

  test("classifierScore kernel == explode + join + re-group reference") {
    import graft.ext.TextAnalysis
    val vocab = SparkEntry.QualityVocab
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kernel = TextAnalysis.classifierScore(docs, "doc_id", "text",
        vocab, biasBp = -50L, keepBp = -34L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val vocabDf = vocab.toSeq.toDF("w", "wt")
    val toks = docs.select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("t"))
    val ref = toks.select(col("doc_id"), size(col("t")).cast("long").as("n"),
        explode(col("t")).as("w"))
      .join(vocabDf, Seq("w"), "left")
      .groupBy("doc_id").agg(first("n").as("n_toks"),
        coalesce(sum("wt"), lit(0L)).as("w_sum"))
      .select(col("doc_id"), col("n_toks"),
        (lit(-50L) + floor(col("w_sum") / col("n_toks"))).cast("long").as("logit_bp"))
      .withColumn("keep", (col("logit_bp") >= lit(-34L)).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(kernel.nonEmpty && kernel == ref)
  }

  test("bm25TopK matches the closed-form score; docs without query terms drop") {
    // N=4, avgdl=3.5; query {a,b}: df(a)=df(b)=2 -> idf = ln 2 for both
    val docs = Seq((1L, "a a a b"), (2L, "a c c c"), (3L, "b b d"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queryTerms = Seq("a", "b"), k = 10)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def score(tfs: Seq[Long], dl: Double): Double = {
      val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
      val s = tfs.map(tf => idf * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * dl / 3.5))).sum
      math.rint(s * 1e6) / 1e6
    }
    assert(out.keySet == Set(1L, 2L, 3L)) // doc 4 has no query term
    assert(out(1L) == (score(Seq(3L, 1L), 4.0), 1L)) // a=3, b=1
    assert(out(3L) == (score(Seq(2L), 3.0), 2L))     // b=2, shorter doc
    assert(out(2L) == (score(Seq(1L), 4.0), 3L))     // a=1
    // content-addressed: membership and ranks survive repartitioning
    val rep = TextAnalysis.bm25TopK(docs.repartition(7), "doc_id", "text",
        Seq("a", "b"), 10)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rep == out)
    // k truncates: top-1 is doc 1 only
    val top1 = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("a", "b"), 1)
      .as[(Long, Double, Long)].collect()
    assert(top1.map(_._1).toSeq == Seq(1L))
  }

  test("rrfFuse: closed-form fusion, one-sided ids, id tiebreak, k cut") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val sem = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val out = TextAnalysis.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
        idCol = "id", rankCol = "rank", k = 10)
      .select("id", "rrf", "rank").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // 10 and 20 are symmetric (ranks {1,2} across the two lists): exact
    // tie on rrf, broken by id — 10 before 20
    assert(out(10L) == (r6(1.0 / 61 + 1.0 / 62), 1L))
    assert(out(20L) == (r6(1.0 / 62 + 1.0 / 61), 2L))
    // one-sided ids contribute only their own list's term
    assert(out(30L) == (r6(1.0 / 63), 3L)) // tie with 40 -> id order
    assert(out(40L) == (r6(1.0 / 63), 4L))
    // k truncates the fused list
    assert(TextAnalysis.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
      "id", "rank", k = 2).count() == 2L)
    // duplicate labels refuse loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.rrfFuse(Seq("x" -> lex, "x" -> sem), "id", "rank", 5)
    }
  }

  test("stripHtml drops tags with attributes, collapses gaps; count matches") {
    val cases = Seq(
      (1L, """<a href="x.html">link</a> text"""),
      (2L, "<br/><br/>a  b\t c"),
      (3L, "no markup"),
      (4L, "<p>edge</p>"),
      (5L, "a < b and b > c")) // lone '<' eats to the next '>' (regex tier)
      .toDF("id", "html")
    val out = cases.select(col("id"),
        TextAnalysis.stripHtml(col("html")).as("c"),
        TextAnalysis.htmlTagCount(col("html")).as("n"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ("link text", 2L))
    assert(out(2L) == ("a b c", 2L))
    assert(out(3L) == ("no markup", 0L))
    assert(out(4L) == ("edge", 2L))
    assert(out(5L) == ("a c", 1L)) // documented regex-tier behavior
  }

  test("unigramJsDivergence: zero on identical slices, ln2 when disjoint") {
    val same = Seq((true, "a b c a"), (false, "a b c a")).toDF("s", "text")
    val z = TextAnalysis.unigramJsDivergence(same, "text", col("s"))
      .select("js_micro").as[Long].head()
    assert(z == 0L, s"identical slices must diverge 0, got $z")
    // disjoint vocabularies: JS = ln 2; per-term micro-rounding makes the
    // exact fixed-point total 2 * round(1e6 * ln2 / 2) = 693148
    val disj = Seq((true, "a a a"), (false, "b b b")).toDF("s", "text")
    val d = TextAnalysis.unigramJsDivergence(disj, "text", col("s"))
      .select("n_terms", "a_tokens", "b_tokens", "js_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(d == ((2L, 3L, 3L, 693148L)), s"got $d")
    // an empty slice is a contract violation, not a NaN
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramJsDivergence(
        Seq((true, "a")).toDF("s", "text"), "text", col("s"))
    }
  }

  private def bpe(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(TextExpressions.bpeTokenize(col("t"), merges).as("toks"))
      .head().getSeq[String](0)

  test("bpeTokenize: closed-form merge semantics") {
    // all occurrences of the chosen pair merge in one round
    assert(bpe("abab", Seq(("a", "b"))) == Seq("ab", "ab"))
    // rank order chains merges: (a,b) then (ab,c)
    assert(bpe("abc", Seq(("a", "b"), ("ab", "c"))) == Seq("abc"))
    // LOWEST-rank pair wins even when a higher-rank pair appears earlier
    // in the word: rank 0 = (b,c) fires before rank 1 = (a,b) could
    assert(bpe("abc", Seq(("b", "c"), ("a", "b"))) == Seq("a", "bc"))
    // left-to-right single-round merging: "aaab" under (a,a) gives
    // [aa, a, b] — the leftover 'a' does NOT re-pair with the merged aa
    assert(bpe("aaab", Seq(("a", "a"))) == Seq("aa", "a", "b"))
    // merges never cross a whitespace boundary
    assert(bpe("ab ab", Seq(("b", "a"))) == Seq("a", "b", "a", "b"))
    // empty merge list = code-point symbols
    assert(bpe("héé", Nil) == Seq("h", "é", "é"))
  }

  test("bpeTokenize conserves non-whitespace code points in order") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "e"))
    val texts = Seq("abc de fabcde", "  spaced   out  ", "xyz")
    texts.foreach { t =>
      assert(bpe(t, merges).mkString("") == t.replaceAll("\\s+", ""))
    }
  }

  test("unigramFitLocal: closed-form hard-EM on a hand-computable corpus") {
    // words: ab x3, cd x1. Seed: singles {a,b,c,d} + multi {ab, cd}.
    // E-step segments ab->[ab], cd->[cd]; M-step: used ab:3, cd:1,
    // singles +1 smoothing each, total 8. Micro-nat scores:
    //   ab = round(ln(3/8)*1e6) = -980829
    //   everything else = round(ln(1/8)*1e6) = -2079442
    // Second EM round reproduces the same segmentation: fixpoint.
    val vocab = TextAnalysis.unigramFitLocal(
      Seq("ab ab", "ab cd"), vocabSize = 2, seedMaxLen = 2, seedCap = 10)
    assert(vocab == Seq(
      ("a", -2079442L), ("ab", -980829L), ("b", -2079442L),
      ("c", -2079442L), ("cd", -2079442L), ("d", -2079442L)))
  }

  test("unigramTokenize: Viterbi segmentation, ties prefer longer pieces, OOV degrades") {
    import graft.functions.TextExpressions
    def toks(text: String, vocab: Seq[(String, Long)]): Seq[String] =
      Seq(text).toDF("t")
        .select(TextExpressions.unigramTokenize(col("t"), vocab).as("x"))
        .head().getSeq[String](0)
    val v = Seq(("a", -2000000L), ("b", -2000000L), ("c", -2000000L),
      ("ab", -1000000L), ("abc", -2500000L), ("d", -2000000L))
    // 'abc': [abc] = -2.5e6 beats [ab,c] = -3e6 and [a,b,c] = -6e6
    assert(toks("abc", v) == Seq("abc"))
    // 'abd': [ab,d] = -3e6 beats [a,b,d] = -6e6
    assert(toks("abd", v) == Seq("ab", "d"))
    // whitespace boundaries are never crossed
    assert(toks("ab  ab", v) == Seq("ab", "ab"))
    // OOV code point falls back to a worse-than-anything single piece
    assert(toks("axb", v) == Seq("a", "x", "b"))
    // exact-score tie prefers the LONGER last piece deterministically
    val tie = Seq(("a", -1000000L), ("aa", -2000000L))
    assert(toks("aa", tie) == Seq("aa"))
    // char conservation incl. a surrogate pair outside the vocab
    val emoji = "a😀b"
    assert(toks(emoji, v).mkString("") == emoji)
  }

  test("unigramFitLocal: prune loop hits the multi-piece budget, deterministic, kernel-compatible") {
    var seed = 555L
    def nextInt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val syl = Vector("ka", "to", "mi", "ra", "zu", "ne", "pa", "lo")
    val texts = (1 to 200).map(_ => (1 to (2 + nextInt(5))).map(_ =>
      (1 to (1 + nextInt(3))).map(_ => syl(nextInt(8))).mkString).mkString(" "))
    val fit1 = TextAnalysis.unigramFitLocal(texts, vocabSize = 24)
    val fit2 = TextAnalysis.unigramFitLocal(texts, vocabSize = 24)
    assert(fit1 == fit2, "fit must be run-to-run deterministic")
    def cpLen(p: String) = p.codePointCount(0, p.length)
    assert(fit1.count(v => cpLen(v._1) > 1) <= 24, "multi budget respected")
    assert(fit1.forall(_._2 < 0L), "log-probs are negative micro-nats")
    // every single code point of the corpus survives in the vocab
    val cps = texts.flatMap(_.replaceAll("\\s+", "")).map(_.toString).toSet
    assert(cps.subsetOf(fit1.map(_._1).toSet))
    // the kernel applies it with char conservation + real compression
    import graft.functions.TextExpressions
    val out = texts.toDF("t")
      .select(TextExpressions.unigramTokenize(col("t"), fit1).as("x"))
      .select(aggregate(col("x"), lit(0L), (a, s) => a + length(s)).as("nc"),
        size(col("x")).cast("long").as("nt"))
      .agg(sum(col("nc")).as("nc"), sum(col("nt")).as("nt")).head()
    val rawChars = texts.map(_.replaceAll("\\s+", "").length.toLong).sum
    assert(out.getLong(0) == rawChars, "token chars must conserve corpus chars")
    assert(out.getLong(1) < rawChars, "multi pieces must actually compress")
  }

  test("incremental bpeLearn == sequential on randomized corpora (overlaps, surrogates)") {
    // the round-13 delta bookkeeping's adversarial surface: overlapping
    // self-pairs ("aaa" under (a,a)), words mutated by earlier batches,
    // multi-codepoint symbols (emoji = surrogate pairs), and heavy ties
    var seed = 424242L
    def nextInt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val atoms = Vector("a", "b", "ab", "aa", "😀", "ка", "to", "mi")
    for (trial <- 1 to 6) {
      val texts = (1 to 60 + nextInt(60)).map(_ =>
        (1 to (1 + nextInt(4))).map(_ =>
          (1 to (1 + nextInt(5))).map(_ => atoms(nextInt(8))).mkString
        ).mkString(" "))
      val n = 10 + nextInt(30)
      val local = TextAnalysis.bpeLearnLocal(texts, nMerges = n)
      val dist = TextAnalysis.bpeLearn(texts.toDF("text"), "text", nMerges = n,
        batchN = 1 + nextInt(16), candPool = 8 + nextInt(100))
      assert(dist == local,
        s"trial $trial diverged (n=$n): dist=${dist.take(5)} local=${local.take(5)}")
    }
  }

  test("unigramFit (distributed) == unigramFitLocal, bit-identical") {
    var seed = 909L
    def nextInt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val syl = Vector("ka", "to", "mi", "ra", "zu", "ne", "pa", "lo")
    val texts = (1 to 150).map(_ => (1 to (2 + nextInt(5))).map(_ =>
      (1 to (1 + nextInt(3))).map(_ => syl(nextInt(8))).mkString).mkString(" "))
    val local = TextAnalysis.unigramFitLocal(texts, vocabSize = 16)
    val dist = TextAnalysis.unigramFit(
      texts.toDF("text").repartition(7), "text", vocabSize = 16)
    assert(dist == local, "distributed hard-EM must equal the driver fit")
    assert(local.nonEmpty)
    // empty corpus degenerates identically
    assert(TextAnalysis.unigramFit(
      Seq.empty[String].toDF("text"), "text", vocabSize = 4).isEmpty)
  }

  test("bpeLearn picks most-frequent pairs deterministically and chains") {
    // corpus: "ab" dominates; after merging (a,b), pair (ab,c) dominates
    val docs = Seq("abc abc ab", "abc ab zz").toDF("text")
    val merges = TextAnalysis.bpeLearn(docs, "text", nMerges = 3)
    assert(merges.take(2) == Seq(("a", "b"), ("ab", "c")))
    // and applying the learned list compresses the training text
    assert(bpe("abc ab", merges) == Seq("abc", "ab"))
  }

  test("bpeLearn stops when no pair repeats") {
    val docs = Seq("ab", "cd").toDF("text") // every adjacent pair unique
    assert(TextAnalysis.bpeLearn(docs, "text", nMerges = 5).isEmpty)
  }

  test("bpeLearnLocal == distributed bpeLearn (same merges, same order)") {
    val texts = Seq("abc abc ab", "abc ab zz", "zzq zzq abq",
      "the quick fox the quick", "aa aa aab")
    val dist = TextAnalysis.bpeLearn(texts.toDF("text"), "text", nMerges = 8)
    val local = TextAnalysis.bpeLearnLocal(texts, nMerges = 8)
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("batched bpeLearn == sequential local fit across batch/pool settings") {
    // a deterministic pseudo-random corpus with heavy pair-count ties and
    // chained merges — the shapes the batch compatibility+truncation
    // rules exist for. Seeded LCG, no java.util.Random (engine-portable
    // fixture, same every run).
    var seed = 12345L
    def nextInt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val syllables = Vector("ka", "to", "mi", "ra", "zu", "ne", "pa", "lo")
    val texts = (1 to 400).map { _ =>
      (1 to (2 + nextInt(6))).map(_ =>
        (1 to (1 + nextInt(3))).map(_ => syllables(nextInt(8))).mkString
      ).mkString(" ")
    }
    val local = TextAnalysis.bpeLearnLocal(texts, nMerges = 50)
    assert(local.length == 50, s"fixture too thin: ${local.length} merges")
    val df = texts.toDF("text")
    for ((bn, pool) <- Seq((64, 1024), (8, 1024), (64, 16), (3, 7))) {
      val dist = TextAnalysis.bpeLearn(df, "text", nMerges = 50,
        batchN = bn, candPool = pool)
      assert(dist == local, s"batchN=$bn candPool=$pool diverged from sequential")
    }
    // skip-mode (the industry relaxation): an openly DIFFERENT-but-valid
    // vocabulary (stale in-round counts after a skip — this tie-heavy
    // fixture opens the divergence window on purpose). Pinned: run-to-run
    // determinism, the first merge (always the true global argmax), full
    // requested length, and that every learned merge was a real pair
    // (applying the list compresses the corpus monotonically).
    val skip = TextAnalysis.bpeLearn(df, "text", nMerges = 50,
      batchN = 64, candPool = 1024, strictOrder = false)
    val skip2 = TextAnalysis.bpeLearn(df, "text", nMerges = 50,
      batchN = 64, candPool = 1024, strictOrder = false)
    assert(skip == skip2, "skip-mode must be run-to-run deterministic")
    assert(skip.head == local.head, "first merge is the global argmax in both modes")
    assert(skip.length == 50)
  }

  test("gopherRepetition: dup lines, top-gram share (capped), dup-gram interval-union coverage") {
    // hand-computed at lineWords=3, topN=2, dupN=2 (single-char words make
    // every char count auditable; norm_len = W + (W-1) spaces)
    val docs = Seq(
      (1L, "a b c a b c d e f"), // dup line "a b c" x2; "a b"/"b c" dup grams
      (2L, "x y z w v"),         // no repetition of any kind
      (3L, "a a a a"),           // overlapping top-gram: nominal share >100% -> cap
      (4L, "q"))                 // single word: one degenerate gram, no dups
      .toDF("doc_id", "text")
    def run(f: (org.apache.spark.sql.DataFrame, String, String, Int, Int, Int) =>
        org.apache.spark.sql.DataFrame) =
      f(docs, "doc_id", "text", 3, 2, 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = run(TextAnalysis.gopherRepetition)
    // the compiled kernel and the declarative HOF twin are bit-identical
    assert(run(TextAnalysis.gopherRepetitionHof) == got,
      "kernel and HOF twin diverged")

    // doc 1: lines [a b c][a b c][d e f] -> 2/3 dup, chars 10/17;
    // top gram "a b" (lexicographic tie-winner among the x2 grams),
    // chars 2*3/17; dup-2-gram starts {1,2,4,5} cover words 1..6 -> 6/9
    assert(got(1L) == ((3L, 6666L, 5882L, 3529L, 6666L)))
    // doc 2: nothing repeats; top gram count 1, chars 3/9
    assert(got(2L) == ((2L, 0L, 0L, 3333L, 0L)))
    // doc 3: "a a" x3 overlapping -> 9 chars over norm_len 7 -> capped at
    // 10000; dup starts {1,2,3} cover every word -> 10000
    assert(got(3L) == ((2L, 0L, 0L, 10000L, 10000L)))
    // doc 4: one 1-word "gram" (the shingle floor), count 1 over norm_len 1
    assert(got(4L) == ((1L, 0L, 0L, 10000L, 0L)))
  }

  test("c4Filter: line retention rules, page drops, and the cleaned-text content address") {
    val keepA = "this line has five words."
    val keepB = "another fine sentence right here!"
    val docs = Seq(
      // 3 kept lines -> page kept; the no-punct and short lines drop
      (1L, s"$keepA\nno terminal punctuation here\nshort line.\n$keepB\nquoted line is long enough \""),
      // only 2 kept lines -> page dropped by the 3-sentence floor
      (2L, s"$keepA\n$keepB"),
      // javascript line drops (case-insensitive), leaving 2 -> dropped
      (3L, s"$keepA\nEnable JavaScript to view this page.\n$keepB"),
      // '{' anywhere drops the page even with 3 kept lines
      (4L, s"$keepA\n$keepB\nvar config = { a };\nthird valid sentence is here."),
      // lorem ipsum: its own line IS retained (punct + 5 words), page dropped
      (5L, s"$keepA\n$keepB\nlorem ipsum dolor sit amet."),
      // bad word: token-exact, page dropped
      (6L, s"$keepA\n$keepB\nthis mentions badword1 clearly."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.c4Filter(docs, "doc_id", "text",
      minLineWords = 5, minKeptLines = 3, badWords = Seq("badword1"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    assert(got(1L)._1 == 5L && got(1L)._2 == 3L && got(1L)._3 == 1L)
    assert(got(2L) == ((2L, 2L, 0L,
      md5Hex(s"$keepA\n$keepB"))))
    assert(got(3L)._2 == 2L && got(3L)._3 == 0L)
    assert(got(4L)._2 == 3L && got(4L)._3 == 0L)
    // the lorem line is retained as a LINE (counts toward n_kept) but the
    // PAGE is dropped — rule precedence
    assert(got(5L)._2 == 3L && got(5L)._3 == 0L)
    // the 4-word bad-word line isn't retained as a line, and the page
    // drops on the token match regardless
    assert(got(6L)._2 == 2L && got(6L)._3 == 0L)
    // doc 1's cleaned text: exactly the three surviving lines, in order
    assert(got(1L)._4 == md5Hex(
      s"$keepA\n$keepB\nquoted line is long enough \""))
  }

  test("gopherQuality: word/line statistics and the composed keep verdict") {
    // 50 alpha words of length 4 and the stop words "the"/"and" -> keeps
    val goodWords = (1 to 48).map(_ => "word").mkString(" ") + " the and"
    val docs = Seq(
      (1L, goodWords),                         // passes every rule
      (2L, "tiny doc the and"),                // 4 words < 50 -> dropped
      // bullets on 9/10 lines (>= 90%) -> dropped; also < 50 words
      (3L, (1 to 9).map(i => s"• ${goodWords.take(20)}").mkString("\n") + "\nplain line"),
      // symbol flood: 10 '#' words over 14 total -> symbol ratio and
      // alpha ratio both fail
      (4L, goodWords.split(" ").take(4).mkString(" ") + " " + (1 to 10).map(_ => "#").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val d1 = got(1L)
    assert(d1.getLong(1) == 50L)               // n_words
    // 48*4 + 3 + 3 = 198 chars -> mean 3.96 -> 396 centichars
    assert(d1.getLong(2) == 396L)
    assert(d1.getLong(3) == 0L && d1.getLong(4) == 0L && d1.getLong(5) == 0L)
    assert(d1.getLong(6) == 10000L)            // all alphabetic
    assert(d1.getLong(7) == 2L)                // the, and
    assert(d1.getLong(8) == 1L, "doc 1 must keep")
    assert(got(2L).getLong(8) == 0L, "word floor must drop doc 2")
    val d3 = got(3L)
    assert(d3.getLong(4) == 9000L && d3.getLong(8) == 0L,
      "90% bullet lines must drop doc 3")
    val d4 = got(4L)
    assert(d4.getLong(3) == math.floor(10000.0 * 10 / 14).toLong)
    assert(d4.getLong(6) == math.floor(10000.0 * 4 / 14).toLong)
    assert(d4.getLong(8) == 0L)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
