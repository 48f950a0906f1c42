package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Normalize, Dedup, Combine, Ids, Cascade, Zip, TemporalJoin, Pack, Components}
import graft.validate.Validations
import graft.state.History
import graft.mapping.RawDict
import graft.io.{Jsonl, Tsv}
import graft.ext.{TextAnalysis, TextDedup, Similarity, Multimodal, EntityResolution}

import SparkEntry._

/** [[SparkEntry]] family slice: text dedup families (d fingerprint/MinHash/SimHash/clusters/decontam).
  * Entry text moved VERBATIM from SparkEntry.scala (round-12 split);
  * the maps are reassembled by concatenation there — keys and oracle
  * text fingerprint-identical (graft.Fingerprint). */
private[graft] object SparkEntryDedup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // W12 STREAMING rollup, driver-judged: the events parquet is consumed
    // through the file-based STREAMING source (the 100 TB shape — new
    // files arriving in a bucket become micro-batches), run through the
    // same watermarked EventStream.hourlyRollup the incremental pipeline
    // uses, and the memory sink is returned for the oracle to hash
    // against the BATCH w2 SQL. Complete mode is a GATE-ONLY device — a
    // finite replay must emit its still-open windows to equal the batch
    // answer; the production path is append/update, where the watermark
    // evicts closed-window state and memory stays bounded at any scale.
    // The streaming path stops being spec-only: a streaming/batch
    // divergence fails the driver's gate.
    // D15 streaming near-dup dedup, driver-judged (w12/v9 discipline for
    // order-dependent semantics that no SQL oracle can replay): three
    // path-ordered single-file micro-batches stream through
    // NearDupStream TWICE from clean state; the gate emits constants —
    // run-to-run determinism (checkpointed replay must land the
    // identical accepted set), the LSM registry invariant (state holds
    // exactly the accepted docs' band buckets), and accepted ⊆ input.
    // The screen rule itself is spec-verified against an independent
    // re-derivation (StreamingSpec); this gate judges the INVARIANTS on
    // driver data at every SF.
    "d15_stream_neardup" -> ((s, dir) => {
      import graft.streaming.NearDupStream
      val root = s"$streamScratchDir/nd_${dirKey(dir)}"
      rmTree(root)
      val in = s"$root/in"
      new java.io.File(in).mkdirs()
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      // single-file batches named so listing order == intended order
      // (the file source breaks mtime ties by path)
      for (b <- 0 until 3) {
        val tmp = s"$root/tmp$b"
        docs.filter(col("doc_id") % 3 === b)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$in/b$b.parquet"))
        rmTree(tmp)
      }
      val schema = s.read.parquet(in).schema
      def startRun(tag: String) =
        NearDupStream.start(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in),
          s"$root/out$tag", s"$root/ckpt$tag", s"$root/state$tag")
      // the determinism gate's two clean runs are INDEPENDENT (separate
      // checkpoint/state/output dirs, both from empty state), so they
      // run CONCURRENTLY (guide §2.6 overlapping jobs, round-20): each
      // stream's per-trigger driver gaps are back-filled by the other
      // stream's micro-batch work. Results are per-run deterministic
      // functions of (input order, empty state) — identical to the
      // sequential schedule the gate previously used.
      val qA = startRun("A")
      val qB = startRun("B")
      qA.awaitTermination()
      qB.awaitTermination()
      // `a` feeds FOUR gate actions (count, rerun diff, bucket-key
      // re-derivation, subset check) — cache it for the gate section
      // (bench drain unpersists after)
      val a = s.read.parquet(s"$root/outA").persist()
      val b = s.read.parquet(s"$root/outB")
      val nDocs = docs.count()
      val nA = a.count()
      val rerunMiss = a.select(col("doc_id")).withColumn("x", lit(1))
        .join(b.select(col("doc_id")).withColumn("y", lit(1)),
          Seq("doc_id"), "full_outer")
        .filter(col("x").isNull || col("y").isNull).count()
      val stateKeys = graft.state.SeenKeys.load(s, s"$root/stateA")
        .select(col("key").as("bkey"))
      val acceptedKeys = NearDupStream.bucketKeys(a, "doc_id", "text")
        .select(col("bkey")).distinct()
      val syncMiss = stateKeys.withColumn("x", lit(1))
        .join(acceptedKeys.withColumn("y", lit(1)), Seq("bkey"), "full_outer")
        .filter(col("x").isNull || col("y").isNull).count()
      val subsetViol = a.select(col("doc_id"))
        .join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
      a.unpersist() // the returned frame is a literal; nothing stays pinned
      import s.implicits._
      Seq((nDocs,
        if (nA >= 1 && nA <= nDocs) 1 else 0,
        if (rerunMiss == 0) 1 else 0,
        if (syncMiss == 0) 1 else 0,
        if (subsetViol == 0) 1 else 0))
        .toDF("n_docs", "n_accepted_ok", "rerun_equal", "registry_sync",
          "accepted_subset")
    }),

    // --- LLM-pipeline: deduplication ---

    // D1 exact dedup via canonical-form fingerprint (hash-groupBy).
    "d1_exact_dedup" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
    }),

    // D2 MinHash+LSH near-dup (TextDedup.nearDuplicates) is exercised and
    // judged through its oracle gate d7_minhash_recall; D3 SimHash through
    // d10_simhash_recall — no separate rows-only entries (round-5 verdict:
    // un-judgeable rows are dead weight in the correctness file).

    // D4 unigram Jaccard on a deterministic pair set (consecutive ids) —
    // SQL-checkable exact similarity.
    "d4_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TextDedup.shingles(col("text"), 1).as("sh"))
      val a = d.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
      val b = d.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
      a.join(b, col("doc_id_b") === col("doc_id_a") + 1)
        .select(col("doc_id_a"), col("doc_id_b"),
          floor(TextDedup.jaccard(col("sh_a"), col("sh_b")) * 10000).as("jaccard_bp"))
    }),

    // D6 EXACT near-dup pairs via the inverted shingle index — no LSH
    // approximation, so DuckDB can recompute every row and hash-match the
    // exact Jaccard values (ground truth for d2/d7). ANCHORED
    // ([[truthAnchors]]): df-capped exact pairs between the K-anchor
    // content-addressed set and the FULL corpus — the whole corpus at the
    // judged sf0.01/sf0.1 (K ≥ n), constant pair-join cost beyond it
    // (Σ df_anchor·min(df,cap) is bounded by the anchors); the df cap
    // (DupShingleMaxDf, d9's dial) reproduces the uncapped pair set at
    // judged scales while bounding every index bucket.
    "d6_exact_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextDedup.anchoredJaccardPairs(docs, truthAnchors(docs),
        "doc_id", "text", n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
    }),

    // D7 MinHash recall gate: the d2 LSH+verify path must recover the
    // exact-truth pair set (same shape as the e6/e7 ANN gates — the oracle
    // pins the true-pair count and asserts the recall flag).
    // Ground truth is the [[truthAnchors]]-anchored exact tier; the LSH
    // path under test still runs over the FULL corpus — anchored-pair
    // recall is an unbiased estimate of pair-level recall.
    "d7_minhash_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exact = TextDedup.anchoredJaccardPairs(docs, truthAnchors(docs),
          "doc_id", "text", n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
        .select(col("doc_id_a"), col("doc_id_b"))
      val cand = TextDedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.3)
        .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"))
        .withColumn("hit", lit(1L))
      exact.join(cand, Seq("doc_id_a", "doc_id_b"), "left")
        .agg(
          count(lit(1)).as("n_true_pairs"),
          // zero true pairs = vacuous pass (matches the oracle's constant
          // recall_ok=1; avoids a null/0-division false alarm)
          when(count(lit(1)) === 0, lit(1L))
            .when(floor(sum(coalesce(col("hit"), lit(0L))) * lit(10000) / count(lit(1)))
              >= MinhashRecallMinBp, lit(1L)).otherwise(lit(0L)).as("recall_ok"))
    }),

    // D8 benchmark decontamination: word-trigram overlap of every corpus
    // doc against the benchmark set (doc_id % 10 = 0 stands in for the
    // eval suite) — inverted-index equi-join, never doc x doc.
    "d8_contamination" -> ((s, dir) => {
      TextDedup.contamination(t(s, dir, "documents"), "doc_id", "text",
        isBenchmark = pmod(col("doc_id"), lit(10)) === 0, n = 3)
    }),

    // D13 Bloom-tier decontamination: same exact result as d8, reached
    // through a driver-built Bloom prescreen on the corpus gram stream —
    // the shape that survives an eval suite too big to broadcast as a
    // hash relation. The oracle is d8's exact SQL: Bloom's one-sided
    // error plus the verify join make the tiers row-identical.
    "d13_bloom_decontam" -> ((s, dir) => {
      TextDedup.bloomContamination(t(s, dir, "documents"), "doc_id", "text",
        isBenchmark = pmod(col("doc_id"), lit(10)) === 0, n = 3)
    }),

    // D9 duplicate clusters: exact near-dup PAIRS resolved to connected
    // components — every doc labeled with the min doc id of its duplicate
    // cluster (the keep-doc). Hash-min fixpoint on the driver
    // (ops.Components), 2-4 rounds on dedup graphs. The pair feed is the
    // df-CAPPED inverted index ([[DupShingleMaxDf]]): identical pair set
    // at judged scales, bounded buckets (Σ min(df,cap)², linear) at 100×
    // — the oracle applies the same HAVING cap, so the judged semantics
    // stay exactly matched at every SF by construction.
    "d9_dup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = TextDedup.exactJaccardPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
        .select(col("doc_id_a"), col("doc_id_b"))
      Components.connected(pairs, "doc_id_a", "doc_id_b",
          vertices = Some(docs.select(col("doc_id"))), idCol = "doc_id")
        .select(col("doc_id"), col("component").as("cluster_id"))
    }),

    // D14 cluster representatives — the "which copy survives" act on
    // d9's detection: per duplicate cluster keep the doc winning
    // (n_chars DESC, doc_id ASC) — prefer the longest (least-truncated)
    // copy, id as the deterministic tiebreak. One labels⋈attrs join +
    // one component-keyed window on top of the shared cluster pass;
    // window partitions are bounded by the largest cluster, not the
    // corpus. Singleton docs are their own representatives (dedup output
    // = exactly the rep set).
    "d14_cluster_rep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = TextDedup.exactJaccardPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
        .select(col("doc_id_a"), col("doc_id_b"))
      val labels = Components.connected(pairs, "doc_id_a", "doc_id_b",
        vertices = Some(docs.select(col("doc_id"))), idCol = "doc_id")
      Components.representatives(labels,
          docs.select(col("doc_id"), col("n_chars")), idCol = "doc_id",
          order = Seq(col("n_chars").desc, col("doc_id")))
        .select(col("component").as("cluster_id"), col("rep_doc_id"),
          col("n_members"))
    }),

    // D16 LSH-fed cluster twin — the 100-TB SHIPPED path for d9's
    // clustering act: MinHash-LSH candidate pairs (banded equi-join,
    // never an index bucket²) → exact-Jaccard verify → connected
    // components, gated on co-membership recall against the df-capped
    // exact-pair clusters (d9's feed). Of the true pairs, the share whose
    // endpoints land in the SAME LSH-fed component must clear
    // [[ClusterRecallMinBp]]; the truth tier here is the disclosed
    // verifier (like d7/d10), the LSH path is the product. Components
    // can only merge what pairs connect, so recall ≥ pair recall.
    "d16_lsh_clusters" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val lshPairs = TextDedup.nearDuplicates(docs, "doc_id", "text",
          threshold = 0.3)
        .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"))
      val labels = Components.connected(lshPairs, "doc_id_a", "doc_id_b",
          vertices = Some(docs.select(col("doc_id"))), idCol = "doc_id")
        .select(col("doc_id"), col("component"))
      val truePairs = TextDedup.exactJaccardPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
        .select(col("doc_id_a"), col("doc_id_b"))
      truePairs
        .join(labels.select(col("doc_id").as("doc_id_a"),
          col("component").as("ca")), Seq("doc_id_a"))
        .join(labels.select(col("doc_id").as("doc_id_b"),
          col("component").as("cb")), Seq("doc_id_b"))
        .select(when(col("ca") === col("cb"), 1L).otherwise(0L).as("hit"))
        .agg(
          count(lit(1)).as("n_true_pairs"),
          // zero true pairs = vacuous pass (see d7)
          when(count(lit(1)) === 0, lit(1L))
            .when(floor(sum(col("hit")) * lit(10000) / count(lit(1)))
              >= ClusterRecallMinBp, lit(1L)).otherwise(lit(0L)).as("recall_ok"))
    }),

    // D10 SimHash recall gate: every exact-truth near-dup pair must land
    // within SimhashHammingMax bits (same constant-oracle shape as
    // d7/e6/e7) — closes the last rows-only quality hole (d3/d5 emit
    // signatures the driver can't judge).
    // Signatures come from the FULL corpus (the shipped path); the truth
    // side is the [[truthAnchors]]-anchored exact tier (see d6/d7).
    "d10_simhash_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sig = docs.select(col("doc_id"), TextDedup.simhash(col("text")).as("sh"))
      val truePairs = TextDedup.anchoredJaccardPairs(docs, truthAnchors(docs),
          "doc_id", "text", n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
        .select(col("doc_id_a"), col("doc_id_b"))
      truePairs
        .join(sig.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a")), Seq("doc_id_a"))
        .join(sig.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b")), Seq("doc_id_b"))
        .select(when(TextDedup.hamming(col("sh_a"), col("sh_b"))
          <= SimhashHammingMax, 1L).otherwise(0L).as("hit"))
        .agg(
          count(lit(1)).as("n_true_pairs"),
          // zero true pairs = vacuous pass (see d7)
          when(count(lit(1)) === 0, lit(1L))
            .when(floor(sum(col("hit")) * lit(10000) / count(lit(1)))
              >= SimhashRecallMinBp, lit(1L)).otherwise(lit(0L)).as("recall_ok"))
    }),

    // D11 exact duplicate-SPAN detection (Lee et al. 2021 substring-level
    // dedup, relational form): token 13-grams occurring ≥2× corpus-wide
    // mark their positions; adjacent marks merge to maximal spans per doc
    // (gaps-and-islands over a per-doc window). The oracle recomputes the
    // same spans from the gram STRINGS — so the compiled 64-bit gram
    // hashing, the duplicate-gram count, the semi-join recovery, and the
    // island merge are all hash-judged.
    "d11_dup_spans" -> ((s, dir) => {
      TextDedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        k = 13, minOcc = 2)
    }),

    // D12 duplicate-span REMOVAL — the act to d11's detection (Lee et al.
    // remove-all-copies policy): covered tokens cut, survivors re-joined
    // with canonical single spaces, untouched docs passing through with
    // n_tokens_removed = 0 so the output stays row-for-row with the
    // corpus. The oracle rebuilds every document relationally (token
    // explode, anti-join against span coverage, ordered re-aggregation),
    // so the per-row indexed filter lambda is hash-judged token for token.
    "d12_span_removal" -> ((s, dir) => {
      TextDedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        k = 13, minOcc = 2)
        // vacuously-true guard on a COMPUTED column: without it the
        // bench's count() action lets Catalyst eliminate the unique-key
        // left join and with it the entire span pipeline (the timed plan
        // would be a bare corpus count; the written parquet was always
        // real). Filters bear on cardinality, so the plan survives count
        // pruning; every row passes, so the oracle is untouched.
        .filter(col("n_tokens_removed") >= 0)
    }),

    // D17 corpus-wide duplicated-SEGMENT removal — the C4/Dolma/RefinedWeb
    // "drop repeated paragraphs everywhere" pass (segment = disjoint
    // 10-word window here; a real corpus would split on paragraph
    // delimiters). Distinct from d11/d12: no pair enumeration at all —
    // one md5(segment)-keyed aggregate finds segments in >= 2 distinct
    // docs, every occurrence but the global (doc,pos)-first is cut, docs
    // reassemble in ONE doc-keyed aggregate. Linear at 100 TB. The
    // oracle rebuilds every document relationally (slice + unnest-range
    // segmentation, distinct-doc counts, ordered string_agg), so the
    // reassembly is hash-judged segment for segment.
    "d17_segment_dedup" -> ((s, dir) => {
      TextDedup.dedupSegments(t(s, dir, "documents"), "doc_id", "text",
        segWords = 10, minDocs = 2)
    }),

    // D18 — suffix-array substring dedup via distributed PREFIX DOUBLING
    // (round-15; the Lee et al. 2021 suffix-array formulation d11's gram
    // method approximates): per position, the largest power-of-two k
    // whose k-token suffix prefix repeats corpus-wide — one pass grades
    // the whole length ladder 8..128 where a fixed gram can only say
    // "≥ k". Fixture plants a 150-token verbatim block on doc_id%101
    // docs (dup_pow must climb to 128 — far past any practical gram
    // budget) and a 24-token block on %103 (caps at 16: a 32-window
    // crosses into differing context); natural corpus repeats grade at
    // the low rungs. All doubling rounds ride ONE per-doc window sort
    // (lead(·,k) projections — no joins, no per-round action); the
    // oracle recomputes every ladder rung as exact string grams, so the
    // hash-composed ranks are judged position for position.
    "d18_suffix_dedup" -> ((s, dir) => {
      val fix = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 101 === 0,
            concat(col("text"), lit(" " + D18LongBlock)))
          .when(col("doc_id") % 103 === 0,
            concat(col("text"), lit(" " + D18ShortBlock)))
          .otherwise(col("text")).as("text"))
      TextDedup.suffixDupPow(fix, "doc_id", "text",
        maxPow = 128, minOcc = 2, minPow = 8)
    }),
  )

  /** d18 planted blocks — token streams no natural doc contains, shared
    * verbatim across the planted docs so the suffix ladder has a known
    * long-duplicate truth the oracle can restate. */
  private[graft] val D18LongBlock: String =
    (0 until 150).map("zzq" + _).mkString(" ")
  private[graft] val D18ShortBlock: String =
    (0 until 24).map("yyq" + _).mkString(" ")

  val oracle: Map[String, String] = Map(

    // d18: every ladder rung recomputed as EXACT string grams (the d11
    // oracle pattern at k = 8/16/32/64/128 over the planted-block
    // fixture), deduped per (k, gram) corpus-wide, max k per position —
    // the engine's hash-composed doubling ranks must agree on every
    // (doc, pos, dup_pow) row.
    "d18_suffix_dedup" -> {
      val ks = Seq(8, 16, 32, 64, 128)
      val grams = ks.map(k =>
        s"""g$k AS (
           |  SELECT doc_id, $k AS k, unnest(list_transform(range(1, len(t) - ${k - 2}),
           |    i -> {'pos': i - 1,
           |          'gram': array_to_string(list_slice(t, i, i + ${k - 1}), ' ')})) AS pg
           |  FROM toks WHERE len(t) >= $k)""".stripMargin).mkString(",\n")
      val union = ks.map(k => s"SELECT * FROM g$k").mkString(" UNION ALL ")
      s"""WITH t0 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 101 = 0 THEN text || ' $D18LongBlock'
         |         WHEN doc_id % 103 = 0 THEN text || ' $D18ShortBlock'
         |         ELSE text END AS text
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM t0),
         |$grams,
         |u AS ($union),
         |f AS (SELECT doc_id, k, pg.pos AS pos, pg.gram AS gram FROM u),
         |d AS (SELECT k, gram FROM f GROUP BY 1, 2 HAVING count(*) >= 2),
         |p AS (SELECT f.doc_id, f.pos, f.k FROM f JOIN d USING (k, gram))
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(max(k) AS BIGINT) AS dup_pow
         |FROM p GROUP BY 1, 2""".stripMargin
    },

    // d15: constant-oracle gate (d7/m4 discipline) — the engine emits
    // invariant flags for the order-dependent streaming dedup; the
    // oracle pins them true and pins the processed-doc count.
    "d15_stream_neardup" ->
      """SELECT count(*) AS n_docs, 1 AS n_accepted_ok, 1 AS rerun_equal,
        |  1 AS registry_sync, 1 AS accepted_subset
        |FROM documents""".stripMargin,

    "d1_exact_dedup" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents
        |GROUP BY 1""".stripMargin,

    "d4_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(string_split_regex(trim(text), '\s+')) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  CAST(floor(len(list_intersect(a.sh, b.sh)) * 1.0
        |       / len(list_distinct(list_concat(a.sh, b.sh))) * 10000) AS BIGINT) AS jaccard_bp
        |FROM t a JOIN t b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "d6_exact_neardup" ->
      """WITH anch AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT,
        |      doc_id) AS rn
        |    FROM documents)
        |  WHERE rn <= 5000),
        |toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |sh AS (
        |  SELECT sh0.doc_id, sh0.s FROM sh0
        |  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 32) ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT least(a.doc_id, b.doc_id) AS doc_id_a,
        |    greatest(a.doc_id, b.doc_id) AS doc_id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id IN (SELECT doc_id FROM anch)
        |    AND (a.doc_id < b.doc_id OR b.doc_id NOT IN (SELECT doc_id FROM anch))
        |  GROUP BY 1, 2)
        |SELECT doc_id_a, doc_id_b,
        |  CAST(floor(c * 1.0 / (sa.sz + sb.sz - c) * 10000) AS BIGINT) AS jaccard_bp
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_id_a
        |JOIN sizes sb ON sb.doc_id = doc_id_b
        |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3""".stripMargin,

    // d7: constant-oracle recall gate (see e6/e7) — the count side is the
    // exact-truth pair count DuckDB recomputes; the flag asserts the
    // engine's LSH path recovered ≥ the gate share of those pairs.
    "d7_minhash_recall" ->
      """WITH anch AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT,
        |      doc_id) AS rn
        |    FROM documents)
        |  WHERE rn <= 5000),
        |toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |sh AS (
        |  SELECT sh0.doc_id, sh0.s FROM sh0
        |  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 32) ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT least(a.doc_id, b.doc_id) AS doc_id_a,
        |    greatest(a.doc_id, b.doc_id) AS doc_id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id IN (SELECT doc_id FROM anch)
        |    AND (a.doc_id < b.doc_id OR b.doc_id NOT IN (SELECT doc_id FROM anch))
        |  GROUP BY 1, 2)
        |SELECT count(*) AS n_true_pairs, CAST(1 AS BIGINT) AS recall_ok
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_id_a
        |JOIN sizes sb ON sb.doc_id = doc_id_b
        |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3""".stripMargin,

    "d8_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
        |cand AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM cand GROUP BY 1),
        |ov AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM cand c JOIN bench b ON b.s = c.s GROUP BY 1)
        |SELECT o.doc_id, z.n_shingles, o.n_overlap,
        |  CAST(floor(o.n_overlap * 10000.0 / z.n_shingles) AS BIGINT) AS contam_bp
        |FROM ov o JOIN sizes z USING (doc_id)""".stripMargin,

    // d13 is judged against the SAME exact decontamination SQL as d8:
    // the Bloom prescreen must not change a single row.
    "d13_bloom_decontam" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
        |cand AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM cand GROUP BY 1),
        |ov AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM cand c JOIN bench b ON b.s = c.s GROUP BY 1)
        |SELECT o.doc_id, z.n_shingles, o.n_overlap,
        |  CAST(floor(o.n_overlap * 10000.0 / z.n_shingles) AS BIGINT) AS contam_bp
        |FROM ov o JOIN sizes z USING (doc_id)""".stripMargin,

    // d9: the declarative spec of connected components — transitive
    // closure by recursive CTE over the d6 exact-pair edges, component =
    // min reachable id. Tractable for the oracle because dup clusters are
    // tiny; the engine side never materializes a closure.
    // d9/d14/d16 truth feed carries the SAME df cap as the engine
    // (DupShingleMaxDf = 32, the HAVING below): df-filtered Jaccard on
    // both sides — exact agreement at every SF by construction.
    "d9_dup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |sh AS (
        |  SELECT sh0.doc_id, sh0.s FROM sh0
        |  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 32) ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_id_a, doc_id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_id_a
        |  JOIN sizes sb ON sb.doc_id = doc_id_b
        |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3),
        |edges AS (
        |  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
        |  UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS src, doc_id AS dst FROM documents
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst)
        |SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY src""".stripMargin,

    // d14: d9's recursive-CTE closure + per-cluster argmax — the rep is
    // the (n_chars DESC, doc_id) window winner, members counted over the
    // same partition.
    "d14_cluster_rep" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |sh AS (
        |  SELECT sh0.doc_id, sh0.s FROM sh0
        |  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 32) ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_id_a, doc_id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_id_a
        |  JOIN sizes sb ON sb.doc_id = doc_id_b
        |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3),
        |edges AS (
        |  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
        |  UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS src, doc_id AS dst FROM documents
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
        |clus AS (
        |  SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
        |  FROM reach GROUP BY src),
        |ranked AS (
        |  SELECT c.cluster_id, d.doc_id,
        |    row_number() OVER (PARTITION BY c.cluster_id
        |      ORDER BY d.n_chars DESC, d.doc_id) AS rn,
        |    count(*) OVER (PARTITION BY c.cluster_id) AS nm
        |  FROM clus c JOIN documents d USING (doc_id))
        |SELECT cluster_id, doc_id AS rep_doc_id, CAST(nm AS BIGINT) AS n_members
        |FROM ranked WHERE rn = 1""".stripMargin,

    // d16: constant-oracle cluster-recall gate (see d7) — the count side
    // is the df-capped exact-truth pair count; the flag asserts the
    // LSH-fed components kept those pairs co-clustered.
    "d16_lsh_clusters" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |sh AS (
        |  SELECT sh0.doc_id, sh0.s FROM sh0
        |  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 32) ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
        |  CAST(1 AS BIGINT) AS recall_ok
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_id_a
        |JOIN sizes sb ON sb.doc_id = doc_id_b
        |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3""".stripMargin,

    // d10: constant-oracle gate (see d7) — DuckDB pins the true-pair
    // count; the flag asserts the SimHash signatures kept those pairs
    // within the measured Hamming band.
    "d10_simhash_recall" ->
      """WITH anch AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT,
        |      doc_id) AS rn
        |    FROM documents)
        |  WHERE rn <= 5000),
        |toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 2, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
        |  FROM toks),
        |sh AS (
        |  SELECT sh0.doc_id, sh0.s FROM sh0
        |  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 32) ok USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT least(a.doc_id, b.doc_id) AS doc_id_a,
        |    greatest(a.doc_id, b.doc_id) AS doc_id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id IN (SELECT doc_id FROM anch)
        |    AND (a.doc_id < b.doc_id OR b.doc_id NOT IN (SELECT doc_id FROM anch))
        |  GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
        |  CAST(1 AS BIGINT) AS recall_ok
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_id_a
        |JOIN sizes sb ON sb.doc_id = doc_id_b
        |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3""".stripMargin,

    // d11: spans recomputed from gram STRINGS (the engine groups on
    // xxhash64 of the gram — the d6 string↔hash equivalence); the
    // gaps-and-islands merge uses the pos − row_number() constant-run
    // trick on both engines.
    "d11_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 11),
        |    i -> {'pos': i - 1,
        |          'gram': array_to_string(list_slice(t, i, i + 12), ' ')})) AS pg
        |  FROM toks WHERE len(t) >= 13),
        |g2 AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g),
        |d AS (SELECT gram FROM g2 GROUP BY 1 HAVING count(*) >= 2),
        |p AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN d USING (gram)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM p)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 12 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_dup_grams
        |FROM isl GROUP BY doc_id, grp""".stripMargin,

    // d12: spans re-derived as in d11, then every document rebuilt
    // relationally — tokens exploded with positions, covered positions
    // anti-joined away, survivors re-joined in order.
    "d12_span_removal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 11),
        |    i -> {'pos': i - 1,
        |          'gram': array_to_string(list_slice(t, i, i + 12), ' ')})) AS pg
        |  FROM toks WHERE len(t) >= 13),
        |g2 AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g),
        |d AS (SELECT gram FROM g2 GROUP BY 1 HAVING count(*) >= 2),
        |p AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN d USING (gram)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM p),
        |sp AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + 12 AS e
        |  FROM isl GROUP BY doc_id, grp),
        |tok AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
        |    i -> {'pos': i - 1, 'tok': t[i]})) AS p
        |  FROM toks),
        |tp AS (SELECT doc_id, p.pos AS pos, p.tok AS tok FROM tok),
        |keep AS (
        |  SELECT tp.doc_id, tp.pos, tp.tok FROM tp
        |  WHERE NOT EXISTS (SELECT 1 FROM sp
        |    WHERE sp.doc_id = tp.doc_id AND tp.pos BETWEEN sp.s AND sp.e)),
        |rebuilt AS (
        |  SELECT doc_id, coalesce(array_to_string(list(tok ORDER BY pos), ' '), '')
        |      AS clean_text,
        |    count(*) AS n_kept
        |  FROM keep GROUP BY doc_id)
        |SELECT toks.doc_id,
        |  coalesce(rebuilt.clean_text, '') AS clean_text,
        |  CAST(len(toks.t) - coalesce(rebuilt.n_kept, 0) AS BIGINT)
        |    AS n_tokens_removed
        |FROM toks LEFT JOIN rebuilt ON rebuilt.doc_id = toks.doc_id""".stripMargin,

    // d17: full relational rebuild — segmentation by slice, distinct-doc
    // census per segment, global (doc,pos)-first keeper via struct min,
    // ordered string_agg reassembly.
    "d17_segment_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |s AS (
        |  SELECT doc_id, unnest(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS pos, ws
        |  FROM w),
        |s2 AS (
        |  SELECT doc_id, pos,
        |    array_to_string(list_slice(ws, pos * 10 + 1, pos * 10 + 10), ' ') AS seg
        |  FROM s),
        |d AS (
        |  SELECT md5(seg) AS h, count(DISTINCT doc_id) AS ndocs,
        |    (min(struct_pack(d := doc_id, p := pos))).d AS keep_doc,
        |    (min(struct_pack(d := doc_id, p := pos))).p AS keep_pos
        |  FROM s2 GROUP BY 1),
        |dd AS (SELECT h, keep_doc, keep_pos FROM d WHERE ndocs >= 2),
        |j AS (
        |  SELECT s2.doc_id, s2.pos, s2.seg,
        |    CASE WHEN dd.keep_doc IS NULL
        |           OR (s2.doc_id = dd.keep_doc AND s2.pos = dd.keep_pos)
        |      THEN 1 ELSE 0 END AS keep
        |  FROM s2 LEFT JOIN dd ON md5(s2.seg) = dd.h)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
        |  CAST(sum(keep) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep = 1 THEN seg END, ' ' ORDER BY pos), '')
        |    AS dedup_text
        |FROM j GROUP BY doc_id""".stripMargin,
  )
}
