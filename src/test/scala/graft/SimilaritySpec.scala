package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** ANN quality: the approximate paths must recall a reasonable fraction of
  * the exact top-k (they trade recall for pruning; zero overlap would mean
  * the bucketing is broken, not just lossy). */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def recallAgainstBrute(approx: org.apache.spark.sql.DataFrame): Double = {
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", k = 3)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = approx.select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  test("IVF k-NN recalls a meaningful share of exact top-3") {
    val emb = Tables.load(spark, sf, "embeddings")
    val r = recallAgainstBrute(
      Similarity.knnIvf(emb, "vec_id", "embedding", k = 3, nCells = 16, nProbe = 4))
    assert(r > 0.2, s"IVF recall@3 = $r")
  }

  test("LSH k-NN recalls a meaningful share of exact top-3") {
    val emb = Tables.load(spark, sf, "embeddings")
    val r = recallAgainstBrute(
      Similarity.knnLsh(emb, "vec_id", "embedding", k = 3, dim = 64, bits = 6, tables = 8))
    assert(r > 0.3, s"LSH recall@3 = $r")
  }

  test("graphAnn beats its LSH seed tier on the same tables/bits; output shape ranked") {
    val emb = Tables.load(spark, sf, "embeddings")
    val gr = Similarity.graphAnn(emb, "vec_id", "embedding", k = 3,
      dim = 64, bits = 6, tables = 8, degree = 8, hops = 2, beam = 16)
    val rg = recallAgainstBrute(gr)
    val rl = recallAgainstBrute(
      Similarity.knnLsh(emb, "vec_id", "embedding", k = 3, dim = 64,
        bits = 6, tables = 8))
    assert(rg >= rl, s"graph tier must not lose to its seeds: $rg vs $rl")
    assert(rg > 0.5, s"graph recall@3 = $rg")
    val bad = gr.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("n") > 3 || col("mx") > 3 || col("mn") =!= 1)
    assert(bad.isEmpty)
  }

  test("knnGraph: hard 2R degree bound (hub prune), no self-loops, forward edges kept") {
    val emb = Tables.load(spark, sf, "embeddings")
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", degree = 4,
      dim = 64, bits = 6, tables = 8)
    assert(g.filter(col("node") === col("nb")).isEmpty, "no self-loops")
    // the DiskANN R-bound: NO node's adjacency exceeds 2·degree — the
    // property that bounds frontier fan-out at beam·2R per query
    assert(g.groupBy("node").count().filter(col("count") > 8).isEmpty,
      "hub prune must hold the 2R degree bound")
    // rank-1 forward edges survive the prune (they are every node's best)
    val raw = Similarity.knnLsh(emb, "vec_id", "embedding", k = 4,
      dim = 64, bits = 6, tables = 8)
    assert(raw.groupBy("vec_id").count().filter(col("count") > 4).isEmpty)
    val top1 = raw.filter(col("rank") === 1)
      .select(col("vec_id").as("node"), col("neighbor_id").as("nb"))
    assert(top1.join(g, Seq("node", "nb"), "left_anti").isEmpty,
      "each node's best forward edge must survive the prune")
  }

  test("IVF emits at most k ranked neighbors per vector, ranks contiguous") {
    val emb = Tables.load(spark, sf, "embeddings")
    val out = Similarity.knnIvf(emb, "vec_id", "embedding", k = 3)
    val bad = out.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("n") > 3 || col("mx") > 3 || col("mn") =!= 1)
    assert(bad.isEmpty)
  }

  test("kmeans: WCSS trace non-increasing, assignment total, fit deterministic") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (c1, trace) = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = 4)
    assert(trace.length == 4)
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-9) + 1e-9, s"WCSS rose: $trace")
    case _ => }
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding", c1)
    assert(assigned.count() == emb.count())
    assert(assigned.filter(col("cell") < 0 || col("cell") >= 8).isEmpty)
    // same data, same params → same centroids whether or not the
    // projection is cached across iterations (seeded init, deterministic
    // per-cell means up to fp aggregation order)
    val (c2, _) = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = 4,
      cache = false)
    assert(c1.length == c2.length)
    c1.zip(c2).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * (math.abs(x) + 1), s"centroids diverged: $x vs $y")
      }
    }
  }

  test("kmeans: duplicate seed vectors dedup by VALUE, never twin centroids") {
    import spark.implicits._
    // 40 rows but only 2 distinct vectors — any k seeds contain duplicates
    val emb = (1L to 40L)
      .map(i => (i, Array.fill(4)(if (i % 2 == 0) 1.0f else -1.0f).toSeq))
      .toDF("vec_id", "embedding")
    val (cents, _) = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 5, iters = 2)
    assert(cents.length <= 2, s"reference-equality distinct kept twins: ${cents.length}")
    assert(cents.map(_.toSeq).distinct.length == cents.length)
  }

  test("PQ: lossless when codebooks can hold every distinct subvector; codes in domain") {
    import spark.implicits._
    // 12 vectors built from 3 distinct 2-dim subvector patterns per
    // subspace — ksub=4 > 3 distinct, so Lloyd parks a centroid on each
    // point and decode(encode(v)) must reproduce v EXACTLY
    val pats = Seq(
      Array(1f, 0f, 0f, 1f, 1f, 1f),
      Array(0f, 1f, 1f, 0f, 2f, 2f),
      Array(2f, 2f, 2f, 2f, 0f, 0f))
    val emb = (0 until 12).map(i => (i.toLong, pats(i % 3).toSeq)).toDF("vec_id", "embedding")
    val books = Similarity.pqFit(emb, "vec_id", "embedding", m = 3, ksub = 4,
      sampleN = 12, iters = 4)
    assert(books.length == 3 && books.forall(_.forall(_.length == 2)))
    val out = emb.select(col("vec_id"),
      Similarity.pqEncode(col("embedding"), books).as("codes"),
      Similarity.pqDecode(Similarity.pqEncode(col("embedding"), books), books).as("rec"),
      col("embedding"))
      .collect()
    out.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.size == 3 && codes.forall(c => c >= 0 && c < 4))
      assert(r.getSeq[Float](2) == r.getSeq[Float](3),
        s"vec ${r.getLong(0)} not reconstructed exactly")
    }
    // determinism: a second fit yields the same codebooks
    val books2 = Similarity.pqFit(emb, "vec_id", "embedding", m = 3, ksub = 4,
      sampleN = 12, iters = 4)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq == books2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("IVF-PQ: probing ALL cells equals brute ADC over the decoded corpus") {
    val emb = Tables.load(spark, sf, "embeddings")
    val ix = Similarity.ivfPqFit(emb, "vec_id", "embedding",
      nCells = 8, m = 8, ksub = 16, sampleN = 128, iters = 3)
    val sub = col("vec_id") % 7 === 0
    // nProbe = nCells -> every candidate is scored, so the composite must
    // coincide with knnBruteFor over the pq-decoded corpus (same ADC
    // quantity, same ranking, same self-exclusion)
    val full = Similarity.ivfPqSearch(ix, emb.filter(sub),
        "vec_id", "embedding", k = 3, nProbe = 8)
      .select("vec_id", "neighbor_id", "rank")
    val dec = emb.select(col("vec_id"),
      Similarity.pqDecode(Similarity.pqEncode(col("embedding"), ix.books), ix.books)
        .as("embedding"))
    val brute = Similarity.knnBruteFor(emb.filter(sub), dec,
        "vec_id", "embedding", k = 3)
      .select("vec_id", "neighbor_id", "rank")
    assert(full.exceptAll(brute).isEmpty && brute.exceptAll(full).isEmpty)
    // the index frame is the m-codes + cell footprint, one row per vector
    assert(ix.data.count() == emb.count())
    val cr = ix.data.select(col("cell"), col("codes")).head()
    assert(cr.getInt(0) >= 0 && cr.getInt(0) < 8 && cr.getSeq[Int](1).size == 8)
  }

  test("IVF-PQ: restricted probing only prunes — results are a subset of full probing") {
    val emb = Tables.load(spark, sf, "embeddings")
    val ix = Similarity.ivfPqFit(emb, "vec_id", "embedding",
      nCells = 8, m = 8, ksub = 16, sampleN = 128, iters = 3)
    val sub = col("vec_id") % 7 === 0
    val narrow = Similarity.ivfPqSearch(ix, emb.filter(sub),
      "vec_id", "embedding", k = 3, nProbe = 2)
    // every (query, neighbor) the narrow probe returns comes from a cell
    // the full probe also scored: pairs are a subset of the all-cells ADC
    // candidate relation (ranks may differ — fewer candidates compete)
    val fullPairs = Similarity.ivfPqSearch(ix, emb.filter(sub),
      "vec_id", "embedding", k = 1000, nProbe = 8) // k > corpus: keep ALL
    assert(narrow.select("vec_id", "neighbor_id")
      .exceptAll(fullPairs.select("vec_id", "neighbor_id")).isEmpty)
  }

  test("IVF-PQ codebook: parquet round-trip bit-exact; torn tables fail loudly") {
    val emb = Tables.load(spark, sf, "embeddings")
    val ix = Similarity.ivfPqFit(emb, "vec_id", "embedding",
      nCells = 8, m = 8, ksub = 16, sampleN = 128, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("e18_cb").toString
    Similarity.saveIvfPqCodebook(spark, ix, dir)
    val (cents, books) = Similarity.loadIvfPqCodebook(spark, dir)
    assert(cents.map(_.toSeq).toSeq == ix.centroids.map(_.toSeq).toSeq)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq ==
      ix.books.map(_.map(_.toSeq).toSeq).toSeq)
    // a torn/partial books table (rows missing) must throw, never
    // zero-fill a plausible-but-wrong codebook — collect a truncated
    // copy first, then overwrite in place (lazy read + overwrite of the
    // same dir would clobber its own input)
    import spark.implicits._
    val few = spark.read.parquet(s"$dir/books")
      .as[(Int, Int, Int, Double)].collect().toSeq
      .sortBy(t => (t._1, t._2, t._3)).dropRight(3)
    few.toDF("sub", "code", "pos", "v")
      .write.mode("overwrite").parquet(s"$dir/books")
    val ex = intercept[IllegalArgumentException] {
      Similarity.loadIvfPqCodebook(spark, dir)
    }
    assert(ex.getMessage.contains("torn"), ex.getMessage)
  }

  test("rerankExact over a complete shortlist reproduces brute k-NN exactly") {
    val emb = Tables.load(spark, sf, "embeddings").limit(60)
    // shortlist = every ordered pair: the exact re-rank then IS brute
    val ids = emb.select(col("vec_id"))
    val allPairs = ids.join(ids.withColumnRenamed("vec_id", "neighbor_id"))
      .filter(col("vec_id") =!= col("neighbor_id"))
    val rr = Similarity.rerankExact(emb, allPairs, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rr == brute, "exact re-rank of a complete shortlist must equal brute")
    // a TRUNCATED shortlist only prunes: re-ranked results are a subset
    // of brute pairs restricted to the shortlist
    val short2 = Similarity.knnIvf(emb, "vec_id", "embedding",
      k = 2, nCells = 4, nProbe = 2)
    val rr2 = Similarity.rerankExact(emb, short2, "vec_id", "embedding", k = 2)
      .select(col("vec_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val shortPairs = short2.select(col("vec_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rr2.subsetOf(shortPairs), "re-rank can only reorder/prune the shortlist")
  }

  test("mmrRerank: a duplicate of the top hit is demoted below a diverse hit") {
    import spark.implicits._
    // 1 and 2 are identical high-relevance vectors; 3 is equally relevant
    // but diverse; 4 is irrelevant. Pure relevance ranks (1,2,3,4) — MMR
    // must pick 1 (id tiebreak over its twin), then 3 (diversity beats
    // the exact duplicate), then 2, then 4.
    val emb = Seq(
      (1L, Seq(0.95f, 0.312f, 0f)),
      (2L, Seq(0.95f, 0.312f, 0f)),
      (3L, Seq(0.95f, -0.312f, 0f)),
      (4L, Seq(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(emb, "vec_id", "embedding",
      Array(1f, 0f, 0f), shortlist = 4, select = 4)
    assert(out.orderBy("sel_rank").collect().map(_.getLong(1)).toSeq
      == Seq(1L, 3L, 2L, 4L))
    // select caps the output even when the shortlist is larger
    assert(Similarity.mmrRerank(emb, "vec_id", "embedding",
      Array(1f, 0f, 0f), shortlist = 4, select = 2).count() == 2)
  }

  test("semantic dedup: candidates are a subset of exact pairs at the same tau") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (cents, _) = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val cand = Similarity.semanticDedupCandidates(
      emb, "vec_id", "embedding", cents, tau = 0.3)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", Similarity.cosine(col("va"), col("vb")))
      .filter(col("sim") >= 0.3).select("id_a", "id_b")
    // every candidate is a true pair (the within-cell filter only PRUNES)
    assert(cand.select("id_a", "id_b").exceptAll(exact).isEmpty)
    // and each candidate pair appears exactly once (single assignment)
    assert(cand.groupBy("id_a", "id_b").count().filter(col("count") > 1).isEmpty)
  }

  test("ivfSearchFromAssignments: correct assignments reproduce knnIvf-shape results; corrupted ones break rank equality") {
    val emb = Tables.load(spark, sf, "embeddings").limit(400)
      .select(col("vec_id"), col("embedding"))
    val sample = (1 to 8).map(i =>
      emb.filter(col("vec_id") % 50 === i).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray).toArray
    val cm = sample
    val good = Similarity.kmeansAssign(emb, "vec_id", "embedding", cm)
    def serve(assign: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSearchFromAssignments(assign, emb,
        "vec_id", "embedding", cm, k = 5, nProbe = 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet
    val served = key(serve(good))
    assert(served.nonEmpty)
    // the gate is not vacuous: rotating every assignment to the next
    // cell must change which neighbors are reachable from probed cells
    val bad = good.withColumn("cell",
      (col("cell") + 1) % lit(cm.length))
    assert(key(serve(bad)) != served,
      "corrupted assignments must not serve rank-identical results")
  }
}
