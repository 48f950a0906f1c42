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

/** [[SparkEntry]] family slice: text analysis + curation families (t scoring/sketches/LM, c curation/packing/mixing).
  * Entry text moved VERBATIM from SparkEntry.scala (round-12 split);
  * the maps are reassembled by concatenation there — keys and oracle
  * text fingerprint-identical (graft.Fingerprint). */
private[graft] object SparkEntryText {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C1 JSONL corpus roundtrip: documents out through the JSONL sink and
    // back through the schema-first reader — the LLM-corpus interchange
    // format beside the reference's TSV surface. The oracle reads the
    // ORIGINAL table: a hash match proves the roundtrip is lossless
    // (JSON string escaping, int64 fidelity, null handling).
    "c1_jsonl_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      Jsonl.write(docs, jsonlScratchDir, "documents")
      Jsonl.read(s, s"$jsonlScratchDir/documents.jsonl", docs.schema)
    }),

    // --- LLM-pipeline: text analysis ---

    // T1 language-ID heuristic (marker-word argmax).
    "t1_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    }),

    // T2 quality scoring (length/stopword/punctuation blend).
    "t2_quality" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(txt).as("n_tokens"),
        TextAnalysis.stopwordHits(txt).as("stopword_hits"),
        TextAnalysis.punctCount(txt).as("punct_cnt"),
        floor(TextAnalysis.qualityScore(txt) * 10000).as("quality_bp"))
    }),

    // T3 token counting: whitespace + BPE-ish regex tokenizers.
    "t3_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tokens_ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("n_tokens_bpe"),
        length(col("text")).cast("long").as("n_chars_seen"))
    }),

    // T4 document fingerprinting.
    "t4_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    }),

    // T6 corpus curation: the composite training-data filter — exact-dup
    // removal (keep min doc per fingerprint) ∧ language agreement ∧
    // quality threshold, in one lineage (scan once, one small self-join on
    // the fingerprint groups).
    "t6_corpus_curation" -> ((s, dir) => {
      val scored = t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        floor(TextAnalysis.qualityScore(col("text")) * 10000).as("quality_bp"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      // keep-min via min_by aggregate: scores each document exactly once
      // (no self-join re-evaluation), and unlike the r3 window form the
      // aggregate partial-merges map-side — the exchange carries one row
      // per fingerprint and nothing gets sorted
      scored
        .groupBy(col("fingerprint"))
        .agg(min_by(
          struct(col("doc_id"), col("lang"), col("lang_pred"), col("quality_bp")),
          col("doc_id")).as("keep"))
        .select(col("keep.*"))
        .filter(col("lang_pred") === col("lang") && col("quality_bp") >= 2000)
        .select(col("doc_id"), col("lang"), col("quality_bp"))
    }),

    // T5 corpus profile by language (doc stats rollup).
    "t5_lang_profile" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          floor(avg(col("n_chars")) * 100).as("avg_chars_c"))
    }),

    // C2 deterministic hash split: stable 80/10/10 train/val/test
    // assignment by content key; the oracle recomputes the exact md5
    // bucket thresholds, so the per-split counts pin the whole mapping.
    "c2_hash_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(TextAnalysis.hashSplit(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .groupBy(col("split")).agg(count(lit(1)).as("cnt"))
    }),

    // T7 PII redaction: emails/SSNs/phones replaced by typed placeholders
    // (the corpus-scrub step between dedup and tokenization), plus a
    // redaction count for quality accounting. One codegen'd projection.
    "t7_redact_pii" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("clean_text"),
        TextAnalysis.piiHits(col("text")).as("pii_hits"))
    }),

    // T8 Unicode NFC normalization via the custom Catalyst expression —
    // Spark has no built-in; DuckDB's nfc_normalize verifies it.
    "t8_nfc_normalize" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.TextExpressions.nfcNormalize(col("text")).as("nfc_text"))
    }),

    // C3 deterministic stratified sampling: per-language keep rates via
    // the md5 threshold (training-mixture construction; pure projection).
    "c3_stratified_sample" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(TextAnalysis.stratifiedSampleFilter(col("lang"), col("doc_id"),
          SampleRates, SampleDefaultRate))
        .select(col("doc_id"), col("lang"))
    }),

    // C16 — the END-TO-END corpus build: the whole pre-training data
    // pipeline as ONE lineage of this engine's operators — benchmark
    // exclusion → exact dedup (d1's canonical fingerprint, keyed
    // window) → decontamination budget (d8's 3-gram overlap; the top
    // decile by contam_bp dropped, cut at the corpus-complete
    // percentile_disc — see [[CorpusContamQuantile]] for why a fixed
    // bp threshold does not survive corpus growth) → quality floor
    // (t2's score ≥ CorpusQualityMinBp) → per-language stratified
    // sampling (c3's content-addressed draw) → per-language build
    // stats with a DECIMAL id-set fingerprint. Every stage is an
    // operator with its own judged row; this row judges their
    // COMPOSITION (stage predicates recomputed verbatim in one oracle
    // WITH-chain). Plan shape: one corpus scan feeds dedup + quality +
    // sampling projections; decontam adds the d8 gram join + one
    // bounded percentile action; stats are one aggregate.
    "c16_corpus_build" -> ((s, dir) => {
      val all = t(s, dir, "documents")
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val w = Window.partitionBy(col("__fp"))
      val dedup = corpus
        .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("__min", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("__min"))
      val contAll = corpus.select(col("doc_id"))
        .join(TextDedup.contamination(all, "doc_id", "text",
            isBenchmark = pmod(col("doc_id"), lit(10)) === 0, n = 3)
          .select(col("doc_id"), col("contam_bp")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("contam_bp"), lit(0L)).as("cbp"))
      // bounded driver scalar (1 row); percentile_disc returns DOUBLE
      // over a BIGINT column (exact at bp magnitudes)
      val thr = contAll
        .agg(expr("percentile_disc(" + CorpusContamQuantile +
          ") WITHIN GROUP (ORDER BY cbp)"))
        .head().getDouble(0).toLong
      val contaminated = contAll.filter(col("cbp") > thr).select(col("doc_id"))
      val clean = dedup.join(contaminated, Seq("doc_id"), "left_anti")
      val good = clean.filter(
        floor(TextAnalysis.qualityScore(col("text")) * 10000) >= CorpusQualityMinBp)
      val sampled = good.filter(TextAnalysis.stratifiedSampleFilter(
        col("lang"), col("doc_id"), SampleRates, SampleDefaultRate))
      sampled.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountWs(col("text"))).as("n_tokens"),
        sum(conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("decimal(38,0)")).cast("string").as("id_fp"))
    }),

    // C4 sequence packing: concat-and-chunk pack assignment at a 2048-
    // token budget via the two-pass distributed prefix sum (ops.Pack) —
    // no global single-task window.
    "c4_pack_sequences" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), (expr("n_chars DIV 4") + lit(1L)).as("toks"))
      Pack.packSequences(toks, "doc_id", "toks", budget = 2048L)
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tok_sum"))
    }),

    // C18 — ATOMIC (no-split) packing, c4's fine-tuning sibling: a doc
    // may not cross pack boundaries. Per id-range bucket (FIXED 8 —
    // bucketing must not depend on session parallelism or the oracle
    // could not restate it), the NEXT-FIT greedy runs over id order —
    // the one bin-packing rule a SQL oracle can replay as a sequential
    // fold. The oracle REPLAYS it exactly: a recursive CTE walks the
    // (bucket, id) order carrying (pack, fill), so every assignment is
    // hash-judged, not just invariant-gated.
    "c18_pack_atomic" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), (expr("n_chars DIV 4") + lit(1L)).as("toks"))
      Pack.packAtomic(toks, "doc_id", "toks", budget = 1024L, buckets = 8)
    }),

    // T9 repetition signal: per-doc duplicate word-bigram fraction
    // (Gopher-style repetitiousness filter input).
    "t9_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text", n = 2)
    }),

    // T26 — the FULL Gopher repetition battery (round-15; Rae et al.
    // 2021 A1.1), beyond t9's distinct-gram ratio: duplicate-line
    // fraction + char fraction (10-word segment lines, d17's
    // convention), top-bigram char share, and duplicated-5-gram char
    // COVERAGE (positional interval union — each char counted once, the
    // paper's "taking care not to count characters twice"). Zero-shuffle
    // in-row sort/fold expressions, O(W log W) per doc. Fixture plants
    // non-degenerate repetition deterministically: %5 docs re-append
    // their own first 10 words (a guaranteed duplicate line + dup
    // 5-grams), %7 docs append a 5x single-word run (top-gram
    // dominance); the oracle replants identically and recomputes every
    // signal relationally (group-counts, window-max, interval union via
    // running prev-end + generate-series coverage).
    "t26_gopher_repetition" -> ((s, dir) => {
      val raw = t(s, dir, "documents")
      val ws = split(trim(col("text")), "\\s+")
      val first10 = concat_ws(" ", slice(ws, 1, 10))
      val planted = raw
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" "), first10))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
              concat(col("text"), lit(" spark spark spark spark spark")))
            .otherwise(col("text")).as("text"))
      TextAnalysis.gopherRepetition(planted, "doc_id", "text",
        lineWords = 10, topN = 2, dupN = 5)
    }),

    // T27 — the C4 heuristic cleanup (round-15; Raffel et al. 2020
    // §2.2): terminal-punctuation + >=5-word + no-"javascript" line
    // retention, and the 3-kept-lines / "{" / "lorem ipsum" / bad-word
    // page drops. The newline-free corpus gets its line structure
    // PLANTED deterministically (m-series discipline): 8-word lines,
    // line j of doc d terminal-punctuated unless (d+j)%3==0, its first
    // word replaced by "javascript" when (7d+j)%11==0; %13 docs gain a
    // "{" code line, %17 a lorem-ipsum line (itself punct-terminal and
    // 5 words — kept as a LINE, page dropped anyway: rule precedence
    // exercised), %19 a bad-word line. The oracle replants with the
    // same list arithmetic and re-derives every count and the cleaned
    // text's md5 byte-for-byte.
    "t27_c4_filter" -> ((s, dir) => {
      val raw = t(s, dir, "documents")
      val ws = split(trim(col("text")), "\\s+")
      val w = size(ws)
      val nLn = floor((w - lit(1)).cast("double") / lit(8.0)).cast("int") + lit(1)
      val lines = transform(sequence(lit(0), nLn - lit(1)), j => {
        val base = slice(ws, j * lit(8) + lit(1), lit(8))
        val withJs = when((col("doc_id") * 7 + j) % 11 === 0,
            concat(array(lit("javascript")), slice(base, 2, 7)))
          .otherwise(base)
        val joined = concat_ws(" ", withJs)
        when((col("doc_id") + j) % 3 =!= 0, concat(joined, lit(".")))
          .otherwise(joined)
      })
      val planted = raw.select(col("doc_id"), concat(
          concat_ws("\n", lines),
          when(col("doc_id") % 13 === 0, lit("\nconfig { x }")).otherwise(lit("")),
          when(col("doc_id") % 17 === 0, lit("\nlorem ipsum dolor sit amet."))
            .otherwise(lit("")),
          when(col("doc_id") % 19 === 0, lit("\nthis mentions badword1 clearly."))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.c4Filter(planted, "doc_id", "text",
        minLineWords = 5, minKeptLines = 3,
        badWords = Seq("badword1", "badword2"))
    }),

    // T28 — the Gopher QUALITY battery (round-15; Rae et al. 2021 A1.1),
    // t26's companion: word/line statistics and the composed keep
    // verdict. Planting makes every signal non-degenerate: 8-word lines,
    // "• " bullet prefix when (d+j)%4==0, " ..." ellipsis suffix when
    // (3d+j)%5==0, a symbol-only "# # # #" line on %6 docs (exercising
    // the symbol ratio AND the alphabetic-word floor), an "and that to
    // of" stop-word line on %2 docs (lifting stop_hits past the corpus's
    // organic "the"/"a"). The oracle replants with the same arithmetic
    // and recomputes every statistic relationally.
    "t28_gopher_quality" -> ((s, dir) => {
      val raw = t(s, dir, "documents")
      val ws = split(trim(col("text")), "\\s+")
      val nLn = floor((size(ws) - lit(1)).cast("double") / lit(8.0))
        .cast("int") + lit(1)
      val lines = transform(sequence(lit(0), nLn - lit(1)), j => {
        val joined = concat_ws(" ", slice(ws, j * lit(8) + lit(1), lit(8)))
        val l1 = when((col("doc_id") + j) % 4 === 0,
          concat(lit("• "), joined)).otherwise(joined)
        when((col("doc_id") * 3 + j) % 5 === 0, concat(l1, lit(" ...")))
          .otherwise(l1)
      })
      val planted = raw.select(col("doc_id"), concat(
          concat_ws("\n", lines),
          when(col("doc_id") % 6 === 0, lit("\n# # # #")).otherwise(lit("")),
          when(col("doc_id") % 2 === 0, lit("\nand that to of"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.gopherQuality(planted, "doc_id", "text")
    }),

    // C9 sliding-window chunking with overlap (embedding/RAG prep): every
    // doc → ⌈tokens/48⌉ chunks of ≤64 tokens overlapping by 16; chunk
    // content addressed by md5 so the oracle pins both the boundary
    // arithmetic and the chunk text byte-for-byte.
    "c9_chunks" -> ((s, dir) => {
      TextAnalysis.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 64, overlap = 16)
    }),

    // T10 exact heavy hitters: global top-100 terms by frequency, fully
    // tie-broken — map-side-combining term aggregate, bounded TakeOrdered
    // (never a global sort of the term dictionary).
    // T21 — Misra-Gries heavy hitters, t10's SCALE tier: the exact
    // top-terms pass shuffles one row per distinct term (the vocabulary),
    // while functions.HeavyHitters.mgTopK is a mergeable
    // TypedImperativeAggregate whose exchange carries ≤ budget entries
    // per map task at ANY vocabulary size. The gate checks the sketch's
    // deterministic guarantees against the exact counts in pure integer
    // arithmetic (w9/w11 discipline — sketch content below the guarantee
    // line is partitioning-dependent, so only invariant flags are
    // judged): every term with cnt·(B+1) > n must be present
    // (all_found), and every matched estimate must sit in
    // [cnt − n/(B+1), cnt] (bounds_ok).
    "t21_heavy_hitters" -> ((s, dir) => {
      val B = 128
      val terms = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      val sketch = terms
        .agg(graft.functions.HeavyHitters.mgTopK(col("term"), B).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term").as("term"), col("e.est").as("est"))
      val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val tot = terms.agg(count(lit(1)).as("n"))
      val heavy = exact.crossJoin(broadcast(tot))
        .filter(col("cnt") * (B + 1) > col("n"))
      heavy.join(sketch, Seq("term"), "left")
        .agg(
          count(lit(1)).as("n_heavy"),
          when(count(lit(1)) === 0, lit(1L))
            .when(sum(when(col("est").isNull, 1L).otherwise(0L)) === 0, lit(1L))
            .otherwise(lit(0L)).as("all_found"),
          when(count(lit(1)) === 0, lit(1L))
            .when(sum(when(col("est").isNotNull &&
                (col("est") > col("cnt") ||
                 (col("cnt") - col("est")) * (B + 1) > col("n")), 1L)
              .otherwise(0L)) === 0, lit(1L))
            .otherwise(lit(0L)).as("bounds_ok"))
    }),

    "t10_top_terms" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(100)
    }),

    // T22 — INCREMENTAL heavy hitters, t21's streaming twin: documents
    // arrive as 3 micro-batches; each batch is summarized by the
    // mergeable Misra-Gries aggregate and ONLY the ≤ budget sketch rows
    // land in a per-batch overwrite delta (streaming.HeavyHitterStream —
    // the state log grows by sketch size per batch, never vocabulary;
    // replay-safe by overwrite-idempotence, order-independent because
    // the fold is a commutative sum). The fold's summed estimates keep
    // the full MG guarantee (per-batch bounds telescope: Σ deficits ≤
    // Σ n_b/(B+1) = n/(B+1)), so the gate is t21's VERBATIM: every term
    // with cnt·(B+1) > n present, both bound sides in integer
    // arithmetic, against the exact corpus census.
    "t22_stream_hh" -> ((s, dir) => {
      import graft.streaming.HeavyHitterStream
      val B = 128
      val root = s"$streamScratchDir/${dirKey(dir)}_t22"
      rmTree(root)
      val in = s"$root/in"
      new java.io.File(in).mkdirs()
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      for (b <- 0 until 3) {
        val tmp = s"$root/tmp$b"
        docs.filter(pmod(col("doc_id"), lit(3)) === b)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$in/b$b.parquet"))
        rmTree(tmp)
      }
      val schema = s.read.parquet(in).schema
      val q = HeavyHitterStream.start(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
          .select(explode(split(trim(col("text")), "\\s+")).as("term")),
        "term", s"$root/state", s"$root/ckpt", B)
      try q.processAllAvailable() finally q.stop()
      val sketch = HeavyHitterStream.folded(s, s"$root/state")
      val terms = docs.select(explode(split(trim(col("text")), "\\s+")).as("term"))
      val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val tot = terms.agg(count(lit(1)).as("n"))
      val heavy = exact.crossJoin(broadcast(tot))
        .filter(col("cnt") * (B + 1) > col("n"))
      heavy.join(sketch, Seq("term"), "left")
        .agg(
          count(lit(1)).as("n_heavy"),
          when(count(lit(1)) === 0, lit(1L))
            .when(sum(when(col("est").isNull, 1L).otherwise(0L)) === 0, lit(1L))
            .otherwise(lit(0L)).as("all_found"),
          when(count(lit(1)) === 0, lit(1L))
            .when(sum(when(col("est").isNotNull &&
                (col("est") > col("cnt") ||
                 (col("cnt") - col("est")) * (B + 1) > col("n")), 1L)
              .otherwise(0L)) === 0, lit(1L))
            .otherwise(lit(0L)).as("bounds_ok"))
    }),

    // C5 exact-k per-stratum sample: the k docs per language with the
    // smallest md5(stratum:key) — content-addressed draw, stable across
    // runs/partitionings/engines (quota form of c3's rate form).
    "c5_sample_k" -> ((s, dir) => {
      TextAnalysis.sampleKPerStratum(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        stratum = "lang", key = "doc_id", k = 40)
    }),

    // T11 unigram log-prob scoring (perplexity-filter stand-in): mean
    // ln(corpus term frequency) per document — term-frequency aggregate +
    // token-term join, never a broadcast of the vocabulary.
    "t11_logprob" -> ((s, dir) => {
      TextAnalysis.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
    }),

    // T12 per-document TF-IDF top terms: tf aggregate -> df aggregate on
    // the (doc,term) level (one row per distinct pair, not per token) ->
    // idf join on term (shuffle join; the vocabulary never broadcasts at
    // corpus scale) -> per-doc top-3 rank. Scores round to 6dp BEFORE
    // ranking so cross-engine 1-ulp log differences collapse into exact
    // ties broken lexically.
    "t12_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count() // corpus size: one lightweight count, not a crossJoin of scans
      val tf = docs
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(df_, Seq("term"))
        .withColumn("score",
          round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("rank"), col("score"))
    }),

    // T15 BM25 top-k retrieval for a fixed query-term set: scan-stage
    // token filter to |Q| terms -> (doc,term) tf aggregate -> |Q|-row df
    // broadcast -> doc-length join keyed like the score sum -> global
    // top-20 via TakeOrdered. The lexical-retrieval primitive; contrast
    // t12, which shuffles the whole vocabulary by design.
    "t15_bm25" -> ((s, dir) => {
      TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Bm25Query, k = 20)
    }),

    // T16 bigram collocations by PMI: bigrams built MAP-SIDE by zipping
    // the token array against its own 1-shift (slice+arrays_zip — one
    // split per row; a transform(sequence) lambda would re-split per
    // element, the measured 5x d11 trap) -> (w1,w2) count aggregate with
    // min-count prune BEFORE the unigram joins -> two vocab joins
    // (shuffled by design: a 100 TB corpus vocabulary doesn't broadcast,
    // t11/t12 discipline) -> global top-50 via TakeOrdered. Totals are
    // two scalars from one scan-stage aggregate (t12's count discipline).
    "t16_pmi" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toksArr = split(trim(col("text")), "\\s+")
      val totals = docs.agg(
        sum(size(toksArr)).cast("double").as("t"),
        sum(greatest(size(toksArr) - 1, lit(0))).cast("double").as("b")).head()
      val tTot = totals.getDouble(0)
      val bTot = totals.getDouble(1)
      val uni = docs.select(explode(toksArr).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      val bi = docs
        .select(slice(toksArr, lit(1), size(toksArr) - 1).as("l"),
          slice(toksArr, lit(2), size(toksArr) - 1).as("r"))
        .select(explode(arrays_zip(col("l"), col("r"))).as("z"))
        .select(col("z.l").as("w1"), col("z.r").as("w2"))
      val bc = bi.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n_ab")).filter(col("n_ab") >= 5)
      val scored = bc
        .join(uni.select(col("w").as("w1"), col("n").as("n1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("n").as("n2")), Seq("w2"))
        .withColumn("pmi", round(log(
          (col("n_ab") * lit(tTot) * lit(tTot)) /
            (lit(bTot) * col("n1") * col("n2"))), 6))
      val topK = scored.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(50)
      val w = Window.orderBy(col("pmi").desc, col("w1"), col("w2"))
      topK.withColumn("rank", row_number().over(w).cast("long"))
        .select(col("w1"), col("w2"), col("n_ab"), col("pmi"), col("rank"))
    }),

    // T17 corpus frequency spectrum (freq-of-freq, the Zipf report that
    // sizes vocabularies and tokenizer merges): term-count aggregate ->
    // count-of-counts aggregate. Two shuffles, the second over the tiny
    // (term_freq) domain; no join, no window — the cheapest full-vocab
    // statistic the engine ships.
    "t17_freq_spectrum" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("c").as("term_freq"))
        .agg(count(lit(1)).as("n_terms"))
        .select(col("term_freq"), col("n_terms"))
    }),

    // T19 markup stripping + tag-density: plant real HTML wrapping on the
    // even docs, strip it back off and count the tags removed — both
    // engines compute the clean text with the same regex chain, so the
    // comparison judges the actual transformation (not planted truth).
    // Zero-shuffle projection.
    "t19_html_strip" -> ((s, dir) => {
      val html = when(col("doc_id") % 2 === 0,
          concat(lit("<html><p class=\"x\">"), col("text"),
            lit("</p> <br/></html>")))
        .otherwise(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), html.as("html"))
        .select(col("doc_id"),
          TextAnalysis.htmlTagCount(col("html")).as("n_tags"),
          TextAnalysis.stripHtml(col("html")).as("clean"))
        .withColumn("clean_chars", length(col("clean")).cast("long"))
    }),

    // C12 curriculum staging: quartile the heuristic quality score and
    // assign each doc its training stage (curriculum learning orders the
    // mix easy→hard; c11 then shuffles WITHIN a stage). Boundaries are
    // three percentile_disc picks (actual elements) from one aggregate,
    // broadcast back as literals — stage assignment is a zero-shuffle
    // scan projection, the p15 fence discipline.
    "c12_curriculum" -> ((s, dir) => {
      val scored = t(s, dir, "documents").select(col("doc_id"),
        floor(TextAnalysis.qualityScore(col("text")) * 10000)
          .cast("long").as("q_bp"))
      val b = scored.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY q_bp)"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY q_bp)"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY q_bp)")).head()
      // percentile_disc types its pick DOUBLE even over longs; bp values
      // are far under 2^53, so toLong is exact (h6 discipline)
      val (b1, b2, b3) = (b.getDouble(0).toLong, b.getDouble(1).toLong,
        b.getDouble(2).toLong)
      scored.select(col("doc_id"), col("q_bp"),
        ((col("q_bp") > b1).cast("int") + (col("q_bp") > b2).cast("int") +
          (col("q_bp") > b3).cast("int")).cast("long").as("stage"))
    }),

    // C13 leakage-guarded split: c2's content-addressed train/eval split
    // with dedup hygiene applied at the SPLIT BOUNDARY — a train doc that
    // is a near-duplicate (df-capped exact J ≥ 0.3, d9's bucketed feed)
    // of ANY eval doc is quarantined, so eval content can't leak into
    // training through a near-copy the exact-hash split can't see (the
    // standard eval-decontamination act, here fused with the split so the
    // guard is part of the operator, not an afterthought). Every doc is
    // labeled (train / eval / quarantined) — row count stays the corpus
    // size; the oracle recomputes split + capped pairs + the quarantine
    // CASE relationally.
    "c13_leakage_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val split = docs.select(col("doc_id"),
        TextAnalysis.hashSplit(col("doc_id"),
          Seq("train" -> 0.9, "eval" -> 0.1)).as("split0"))
      val pairs = TextDedup.exactJaccardPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.3, maxDf = Some(DupShingleMaxDf))
        .select(col("doc_id_a"), col("doc_id_b"))
      // undirected adjacency: a leak edge can carry the eval doc on
      // either side of the (a < b)-ordered pair
      val edges = pairs
        .union(pairs.select(col("doc_id_b"), col("doc_id_a")))
        .toDF("doc_id", "peer")
      val evalPeers = split.filter(col("split0") === "eval")
        .select(col("doc_id").as("peer"))
      val leaky = edges.join(evalPeers, Seq("peer"), "left_semi")
        .select(col("doc_id")).distinct().withColumn("leak", lit(1L))
      split.join(leaky, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("split0") === "eval", lit("eval"))
            .when(col("leak").isNotNull, lit("quarantined"))
            .otherwise(lit("train")).as("split"))
    }),

    // T20 per-source curation dashboard — the Gopher-style "how does each
    // source look" report a corpus owner reads before weighting a mix:
    // doc count, exact-dup rate (distinct canonical fingerprints), mean
    // heuristic quality (integer bp per doc, so the mean is an exact-int
    // ratio both engines divide identically), mean length, English share.
    // ONE scan; the count-distinct rides the same aggregate via Expand
    // (v10's disclosed exact-tier cost — sources are few, the group
    // domain is tiny).
    "t20_source_report" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          floor(TextAnalysis.qualityScore(col("text")) * 10000)
            .cast("long").as("q_bp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          round(sum(col("q_bp")) / count(lit(1)), 4).as("mean_quality_bp"),
          round(sum(col("n_chars")) / count(lit(1)), 4).as("mean_chars"),
          round(sum(when(col("lang") === "en", 1L).otherwise(0L)) * 100 /
            count(lit(1)), 4).as("pct_en"))
    }),

    // T18 Jensen–Shannon divergence between the en slice's and the rest's
    // unigram distributions — the token-level "did the mixture drift"
    // scalar (v11 profiles columns; this profiles the LANGUAGE). Both
    // slices' counts ride ONE vocabulary-keyed conditional aggregate;
    // per-term contributions are fixed-pointed to micro-units BEFORE the
    // sum, so float summation order can never move the answer.
    "t18_js_div" -> ((s, dir) => {
      TextAnalysis.unigramJsDivergence(t(s, dir, "documents"), "text",
        sideA = col("lang") === "en")
    }),

    // C6 temperature-scaled mixture resampling: per-language quotas from
    // T=2-flattened corpus shares, membership by the content-addressed
    // md5 draw — the multilingual-balance op (quota form of c3's rates,
    // share-derived unlike c5's fixed k).
    "c6_temperature_mix" -> ((s, dir) => {
      TextAnalysis.temperatureSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        stratum = "lang", key = "doc_id", targetTotal = 300L, temperature = 2.0)
    }),

    // C11 deterministic corpus shuffle into training shards: the "global
    // shuffle before sharding" step every training run needs reproducible.
    // Content-addressed draw (md5 of a seeded key) gives a partition- and
    // engine-independent permutation; shard = 48-bit prefix of the draw
    // mod nShards (map-side), position = rank within shard (ONE shuffle on
    // shard; each window partition is a balanced ~n/nShards slice — never
    // a global single-partition sort, contrast a naive orderBy(draw)).
    "c11_corpus_shuffle" -> ((s, dir) => {
      val draw = md5(concat(lit("shuffle:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("draw"), col("doc_id"))
      t(s, dir, "documents").select(col("doc_id"))
        .withColumn("draw", draw)
        .withColumn("shard",
          conv(substring(col("draw"), 1, 12), 16, 10).cast("long") % 8)
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // C10 mixture resampling to explicit target shares (the data-mixing
    // recipe step): per-category Bernoulli rate share*total/n_c from one
    // broadcast count aggregate, content-addressed u48 threshold in the
    // scan stage — no per-category window (contrast c6's exact-quota
    // shape). Target total is SF-adaptive (half the corpus).
    "c10_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      TextAnalysis.mixtureSample(docs, stratum = "lang", key = "doc_id",
        shares = MixtureShares, targetTotal = math.max(docs.count() / 2, 1L))
    }),

    // C14 — TOKEN-budget mixture (c10's doc-count recipe re-denominated
    // the way real training mixes are specified: token shares of a token
    // budget). 40% corpus budget split en/zh/es/de 50/20/15/10; fr has
    // no share → excluded (c10's rule). Keep test is the exact-integer
    // cross-multiplication draw·T_c < B_c·2^48 in DECIMAL(38,0) — no
    // float rate exists on either engine.
    "c14_token_budget" -> ((s, dir) => {
      TextAnalysis.tokenBudgetSample(t(s, dir, "documents"),
        id = "doc_id", text = "text", category = "lang", budgetBp = 4000,
        sharesBp = Seq("en" -> 5000, "zh" -> 2000, "es" -> 1500, "de" -> 1000))
    }),

    // C7 size-balanced training shards: round-robin within deterministic
    // size buckets — per-bucket windows (parallel), no global sort, no
    // greedy bin-pack heap. Completes the c-family: split (c2), sample
    // (c3/c5/c6), pack (c4), shard (c7).
    "c7_pack_shards" -> ((s, dir) => {
      Pack.balancedShards(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        key = "doc_id", sizeCol = "n_chars", nShards = 8, bucketWidth = 50)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    }),

    // C8 quality-weighted sampling without replacement (Efraimidis–
    // Spirakis): deterministic content-addressed draw, rank by
    // -ln(u)/weight, global top-k via per-partition heaps. Weight here is
    // document length — "sample ∝ size" (any positive score works).
    "c8_weighted_sample" -> ((s, dir) => {
      TextAnalysis.weightedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        key = "doc_id", weightCol = "n_chars", k = 100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // T13 char-level Shannon entropy (gibberish/encoding-noise signal):
    // a compiled SCALAR kernel in the scan projection — zero shuffles
    // (TextAnalysisSpec pins it to the explode+aggregate reference
    // formulation, TextAnalysis.charEntropy).
    "t13_entropy" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_counted"),
          graft.functions.TextExpressions.charEntropy(col("text")).as("entropy"))
    }),

    // T14 model-based quality filter: a trained linear classifier reduced
    // to an integer-bp token weight table (the fastText/DCLM quality-
    // model shape), mean-pooled into a logit per doc by one compiled
    // zero-shuffle scan pass; keep = logit_bp >= 0. Integer weights keep
    // the score order-free and oracle-exact.
    "t14_classifier" -> ((s, dir) => {
      TextAnalysis.classifierScore(t(s, dir, "documents"), "doc_id", "text",
        vocab = QualityVocab, biasBp = -50L, keepBp = -34L)
    }),

    // T24 — bigram-LM quality scoring (Stupid Backoff, Brants et al.
    // 2007): the perplexity-filter shape — an LM counted on one slice
    // scores the other. Train = even doc_ids (v11's parity split),
    // score = odd. Semantics, fixed-point discipline, and join shape in
    // TextAnalysis.bigramLmScore's scaladoc.
    "t24_bigram_lm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bigramLmScore(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
    }),

    // C15 — LM-perplexity curriculum: the t24 Stupid-Backoff scores
    // staged the c12 way — per-doc average log-prob per bigram (exact
    // `div`, truncation-parity with DuckDB `//` even on negatives),
    // quartile boundaries from ONE exact-percentile aggregate as driver
    // literals, zero-shuffle stage assignment on the scored stream.
    // Low-likelihood (hard) docs land in late stages.
    "c15_lm_curriculum" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.bigramLmScore(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .withColumn("lm_avg_micro",
          when(col("n_bigrams") > 0, expr("lm_micro div n_bigrams"))
            .otherwise(lit(0L)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val b = scored.agg(expr(
          "percentile(lm_avg_micro, array(0.25D, 0.5D, 0.75D))"))
        .head().getSeq[Double](0)
      scored.select(col("doc_id"), col("n_bigrams"), col("lm_avg_micro"),
        when(col("lm_avg_micro") <= lit(b(0)), lit(0L))
          .when(col("lm_avg_micro") <= lit(b(1)), lit(1L))
          .when(col("lm_avg_micro") <= lit(b(2)), lit(2L))
          .otherwise(lit(3L)).as("stage"))
    }),

    // T23 — BPE subword tokenization: learn a merge list on the
    // content-addressed 256-doc sample (the production train-on-a-sample
    // shape), APPLY it to the full corpus with the compiled kernel, and
    // gate what the oracle can check exactly: n_chars_total (Σ token
    // lengths == the corpus' non-whitespace code points — any dropped/
    // duplicated/split token breaks the conservation law), compression
    // (merges actually fired), bounds (≥ 1 token per word, ≤ 1 per
    // char), and dual-execution stability (m4 discipline: a
    // repartitioned twin must reproduce every per-doc token-stream
    // checksum).
    "t23_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val draw = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
      // bounded content-addressed collect (the disclosed sample
      // pattern): 256 texts train the merge list DRIVER-SIDE — the
      // iterative fit is latency-bound, not data-bound (bpeLearnLocal
      // scaladoc; spec-pinned equal to the distributed bpeLearn)
      val sampleTexts = docs.select(col("text"), col("doc_id"), draw.as("__draw"))
        .orderBy(col("__draw"), col("doc_id")).limit(256)
        .select(col("text")).collect().map(_.getString(0)).toSeq
      val merges = TextAnalysis.bpeLearnLocal(sampleTexts, nMerges = 24)
      def summary(d: DataFrame) = d.select(col("doc_id"),
        graft.functions.TextExpressions.bpeTokenize(col("text"), merges).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("nt"),
          aggregate(col("toks"), lit(0L),
            (acc, x) => acc + length(x).cast("long")).as("nc"),
          // space separator: a token can never contain whitespace, so the
          // checksum sees the token BOUNDARIES, not just their concat
          conv(substring(md5(array_join(col("toks"), " ")), 1, 10), 16, 10)
            .cast("long").as("ck"))
      val s1 = summary(docs)
      val s2 = summary(docs.repartition(s.sparkContext.defaultParallelism))
      val mism = s1.join(s2.select(col("doc_id"), col("nt").as("nt2"),
          col("nc").as("nc2"), col("ck").as("ck2")), Seq("doc_id"), "full_outer")
        .filter(!(col("nt") <=> col("nt2")) || !(col("nc") <=> col("nc2")) ||
          !(col("ck") <=> col("ck2")))
        .agg(count(lit(1)).as("n_mismatch"))
      val words = docs.select(size(filter(split(trim(col("text")), "\\s+"),
        w => length(w) > 0)).cast("long").as("nw"))
      s1.agg(count(lit(1)).as("n_docs"),
          sum(col("nc")).as("n_chars_total"), sum(col("nt")).as("__nt"))
        .crossJoin(words.agg(sum(col("nw")).as("__nw"))) // 1-row gate join
        .crossJoin(mism)                                 // 1-row gate join
        .select(col("n_docs"),
          col("n_chars_total").cast("long").as("n_chars_total"),
          when(col("__nt") < col("n_chars_total"), 1L).otherwise(0L)
            .as("compress_ok"),
          when(col("__nt") >= col("__nw") && col("__nt") <= col("n_chars_total"),
            1L).otherwise(0L).as("bounds_ok"),
          when(col("n_mismatch") === 0, 1L).otherwise(0L).as("stable_ok"))
    }),

    // T25 — Unigram-LM (SentencePiece) subword tokenization, t23's
    // sibling for the OTHER deployed tokenizer family (T5/LLaMA-class):
    // hard-EM fit (TextAnalysis.unigramFitLocal) on the same bounded
    // content-addressed 256-doc sample, Viterbi APPLY corpus-wide with
    // the compiled kernel (integer micro-nat scores — fit and kernel
    // share one segmentation routine, so they cannot disagree). Gates
    // (t23's class): char conservation, real compression, per-word/
    // per-char bounds, dual-execution stability, plus vocab_ok — the
    // multi-piece budget held and every log-prob is a negative
    // micro-nat (a zero/positive score would mean a degenerate
    // distribution). EM semantics themselves are pinned by
    // TextAnalysisSpec's closed-form fixture.
    "t25_unigram" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val draw = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
      val sampleTexts = docs.select(col("text"), col("doc_id"), draw.as("__draw"))
        .orderBy(col("__draw"), col("doc_id")).limit(256)
        .select(col("text")).collect().map(_.getString(0)).toSeq
      val vocab = TextAnalysis.unigramFitLocal(sampleTexts, vocabSize = 64)
      def cpLen(p: String) = p.codePointCount(0, p.length)
      val vocabOk = vocab.nonEmpty && vocab.forall(_._2 < 0L) &&
        vocab.count(v => cpLen(v._1) > 1) <= 64
      def summary(d: DataFrame) = d.select(col("doc_id"),
        graft.functions.TextExpressions.unigramTokenize(col("text"), vocab).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("nt"),
          aggregate(col("toks"), lit(0L),
            (acc, x) => acc + length(x).cast("long")).as("nc"),
          conv(substring(md5(array_join(col("toks"), " ")), 1, 10), 16, 10)
            .cast("long").as("ck"))
      val s1 = summary(docs)
      val s2 = summary(docs.repartition(s.sparkContext.defaultParallelism))
      val mism = s1.join(s2.select(col("doc_id"), col("nt").as("nt2"),
          col("nc").as("nc2"), col("ck").as("ck2")), Seq("doc_id"), "full_outer")
        .filter(!(col("nt") <=> col("nt2")) || !(col("nc") <=> col("nc2")) ||
          !(col("ck") <=> col("ck2")))
        .agg(count(lit(1)).as("n_mismatch"))
      val words = docs.select(size(filter(split(trim(col("text")), "\\s+"),
        w => length(w) > 0)).cast("long").as("nw"))
      s1.agg(count(lit(1)).as("n_docs"),
          sum(col("nc")).as("n_chars_total"), sum(col("nt")).as("__nt"))
        .crossJoin(words.agg(sum(col("nw")).as("__nw")))
        .crossJoin(mism)
        .select(col("n_docs"),
          col("n_chars_total").cast("long").as("n_chars_total"),
          when(col("__nt") < col("n_chars_total"), 1L).otherwise(0L)
            .as("compress_ok"),
          when(col("__nt") >= col("__nw") && col("__nt") <= col("n_chars_total"),
            1L).otherwise(0L).as("bounds_ok"),
          when(col("n_mismatch") === 0, 1L).otherwise(0L).as("stable_ok"),
          lit(if (vocabOk) 1L else 0L).as("vocab_ok"))
    }),
  )

  val oracle: Map[String, String] = Map(

    "c1_jsonl_roundtrip" ->
      "SELECT doc_id, lang, text FROM documents",

    "c2_hash_split" ->
      """WITH s AS (SELECT CASE
        |    WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < 52429 THEN 'train'
        |    WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < 58982 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS cnt FROM s GROUP BY split""".stripMargin,

    "t7_redact_pii" -> {
      // IDENTICAL patterns to TextAnalysis.{Email,Ssn,Phone}Pattern; the
      // 'g' flag matches Spark's replace-all default. Hit counting mirrors
      // piiHits: each pattern counted on the text as the sequential rules
      // see it (never on pre-existing literal placeholder tokens).
      val em = TextAnalysis.EmailPattern
      val ssn = TextAnalysis.SsnPattern
      val ph = TextAnalysis.PhonePattern
      s"""WITH s1 AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '$em', '<EMAIL>', 'g') AS after_email
         |  FROM documents),
         |s2 AS (
         |  SELECT doc_id, text, after_email,
         |    regexp_replace(after_email, '$ssn', '<SSN>', 'g') AS after_ssn
         |  FROM s1)
         |SELECT doc_id,
         |  regexp_replace(after_ssn, '$ph', '<PHONE>', 'g') AS clean_text,
         |  CAST(len(regexp_extract_all(text, '$em'))
         |     + len(regexp_extract_all(after_email, '$ssn'))
         |     + len(regexp_extract_all(after_ssn, '$ph')) AS BIGINT) AS pii_hits
         |FROM s2""".stripMargin
    },

    "t8_nfc_normalize" ->
      "SELECT doc_id, nfc_normalize(text) AS nfc_text FROM documents",

    "t1_langid" -> {
      def cnt(w: String) =
        s"CAST((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      val scores = TextAnalysis.LangMarkers.map { case (lang, ws) =>
        s"(${ws.map(cnt).mkString(" + ")}) AS s_$lang"
      }.mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id, concat(' ', lower(text), ' ') AS p FROM documents),
         |s AS (SELECT doc_id, $scores FROM t)
         |SELECT doc_id,
         |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
         |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |    WHEN s_es >= s_fr THEN 'es'
         |    ELSE 'fr' END AS lang_pred
         |FROM s""".stripMargin
    },

    "t2_quality" -> {
      def cnt(w: String) =
        s"((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2})"
      val stopSum = TextAnalysis.Stopwords.map(cnt).mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, text, concat(' ', text, ' ') AS p,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
         |  FROM documents),
         |m AS (SELECT doc_id, text, toks,
         |    CAST($stopSum AS BIGINT) AS stop_hits,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS punct
         |  FROM t)
         |SELECT doc_id,
         |  CAST(toks AS BIGINT) AS n_tokens,
         |  stop_hits AS stopword_hits,
         |  punct AS punct_cnt,
         |  CAST(floor((
         |    least(toks / 200.0, 1.0) * 0.4
         |    + least(stop_hits * 10.0 / greatest(toks, 1), 1.0) * 0.4
         |    + greatest(1.0 - (punct * 1.0 / greatest(length(text), 1)) * 5.0, 0.0) * 0.2
         |  ) * 10000) AS BIGINT) AS quality_bp
         |FROM m""".stripMargin
    },

    // c12: t2's quality recomputation + quantile_disc boundaries (same
    // elements percentile_disc picks) + the same strict-> comparisons.
    "c12_curriculum" -> {
      def cnt(w: String) =
        s"((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2})"
      val stopSum = TextAnalysis.Stopwords.map(cnt).mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, text, concat(' ', text, ' ') AS p,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
         |  FROM documents),
         |m AS (SELECT doc_id, text, toks,
         |    CAST($stopSum AS BIGINT) AS stop_hits,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS punct
         |  FROM t),
         |q AS (SELECT doc_id,
         |    CAST(floor((
         |      least(toks / 200.0, 1.0) * 0.4
         |      + least(stop_hits * 10.0 / greatest(toks, 1), 1.0) * 0.4
         |      + greatest(1.0 - (punct * 1.0 / greatest(length(text), 1)) * 5.0,
         |          0.0) * 0.2
         |    ) * 10000) AS BIGINT) AS q_bp
         |  FROM m),
         |b AS (SELECT quantile_disc(q_bp, 0.25) AS b1,
         |    quantile_disc(q_bp, 0.50) AS b2,
         |    quantile_disc(q_bp, 0.75) AS b3 FROM q)
         |SELECT doc_id, q_bp,
         |  CAST(CAST(q_bp > b1 AS INT) + CAST(q_bp > b2 AS INT)
         |    + CAST(q_bp > b3 AS INT) AS BIGINT) AS stage
         |FROM q CROSS JOIN b""".stripMargin
    },

    // c13: c2's md5 split (train < 58982 of 65536 ≙ 0.9) + the d9-capped
    // pair feed + the quarantine CASE — all recomputed relationally.
    "c13_leakage_split" ->
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
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_id_a, doc_id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_id_a
        |  JOIN sizes sb ON sb.doc_id = doc_id_b
        |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3),
        |split AS (
        |  SELECT doc_id, CASE WHEN CAST(('0x' ||
        |      substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |      < 58982 THEN 'train' ELSE 'eval' END AS split0
        |  FROM documents),
        |edges AS (
        |  SELECT doc_id_a AS doc_id, doc_id_b AS peer FROM pairs
        |  UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
        |leaky AS (
        |  SELECT DISTINCT e.doc_id FROM edges e
        |  JOIN split p ON p.doc_id = e.peer AND p.split0 = 'eval')
        |SELECT s.doc_id,
        |  CASE WHEN s.split0 = 'eval' THEN 'eval'
        |    WHEN l.doc_id IS NOT NULL THEN 'quarantined'
        |    ELSE 'train' END AS split
        |FROM split s LEFT JOIN leaky l ON l.doc_id = s.doc_id""".stripMargin,

    // t20: t2's per-doc quality recomputation carried under a per-source
    // rollup; the dup-rate leg is t4's canonical fingerprint distinct.
    "t20_source_report" -> {
      def cnt(w: String) =
        s"((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2})"
      val stopSum = TextAnalysis.Stopwords.map(cnt).mkString(" + ")
      s"""WITH t AS (
         |  SELECT source, lang, n_chars, text, concat(' ', text, ' ') AS p,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
         |  FROM documents),
         |m AS (SELECT source, lang, n_chars, text, toks,
         |    CAST($stopSum AS BIGINT) AS stop_hits,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS punct,
         |    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
         |  FROM t),
         |q AS (SELECT source, lang, n_chars, fp,
         |    CAST(floor((
         |      least(toks / 200.0, 1.0) * 0.4
         |      + least(stop_hits * 10.0 / greatest(toks, 1), 1.0) * 0.4
         |      + greatest(1.0 - (punct * 1.0 / greatest(length(text), 1)) * 5.0,
         |          0.0) * 0.2
         |    ) * 10000) AS BIGINT) AS q_bp
         |  FROM m)
         |SELECT source, count(*) AS n_docs,
         |  count(DISTINCT fp) AS n_unique,
         |  round(sum(q_bp) / count(*), 4) AS mean_quality_bp,
         |  round(sum(n_chars) / count(*), 4) AS mean_chars,
         |  round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 100
         |    / count(*), 4) AS pct_en
         |FROM q GROUP BY source""".stripMargin
    },

    "t6_corpus_curation" -> {
      def cntIn(p: String, w: String) =
        s"CAST((length($p) - length(replace($p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      val langScores = TextAnalysis.LangMarkers.map { case (lang, ws) =>
        s"(${ws.map(cntIn("p_low", _)).mkString(" + ")}) AS s_$lang"
      }.mkString(", ")
      val stopSum = TextAnalysis.Stopwords.map(cntIn("p_raw", _)).mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |    concat(' ', lower(text), ' ') AS p_low,
         |    concat(' ', text, ' ') AS p_raw,
         |    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, lang, text, fingerprint, toks, $langScores,
         |    CAST($stopSum AS BIGINT) AS stop_hits,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS punct
         |  FROM t),
         |m AS (SELECT doc_id, lang, fingerprint,
         |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
         |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |      WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |      WHEN s_es >= s_fr THEN 'es'
         |      ELSE 'fr' END AS lang_pred,
         |    CAST(floor((
         |      least(toks / 200.0, 1.0) * 0.4
         |      + least(stop_hits * 10.0 / greatest(toks, 1), 1.0) * 0.4
         |      + greatest(1.0 - (punct * 1.0 / greatest(length(text), 1)) * 5.0, 0.0) * 0.2
         |    ) * 10000) AS BIGINT) AS quality_bp
         |  FROM s),
         |k AS (SELECT fingerprint, min(doc_id) AS keep_id FROM m GROUP BY fingerprint)
         |SELECT m.doc_id, m.lang, m.quality_bp
         |FROM m JOIN k USING (fingerprint)
         |WHERE m.doc_id = k.keep_id AND m.lang_pred = m.lang AND m.quality_bp >= 2000""".stripMargin
    },

    "t3_tokens" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |    AS n_tokens_bpe,
        |  CAST(length(text) AS BIGINT) AS n_chars_seen
        |FROM documents""".stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,

    "t5_lang_profile" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(floor(avg(n_chars) * 100) AS BIGINT) AS avg_chars_c
        |FROM documents GROUP BY lang""".stripMargin,

    // c3: thresholds are the engine's own precomputed integers — neither
    // engine re-rounds rate*65536.
    "c3_stratified_sample" -> {
      val cases = SampleRates.toSeq.sortBy(_._1)
        .map { case (l, r) => s"WHEN '$l' THEN ${TextAnalysis.rateThreshold(r)}" }
        .mkString(" ")
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substring(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4))
         |      AS BIGINT) AS h,
         |    CASE lang $cases ELSE ${TextAnalysis.rateThreshold(SampleDefaultRate)} END AS thr
         |  FROM documents)
         |SELECT doc_id, lang FROM s WHERE h < thr""".stripMargin
    },

    // c16: the five build stages as one WITH-chain — each stage's
    // predicate is its own judged query's oracle verbatim (d1 dedup,
    // d8 contamination, t2 quality, c3 sampling), composed; the final
    // id-set fingerprint is the a9/s20 DECIMAL(38,0) pattern.
    "c16_corpus_build" -> {
      def cnt(w: String) =
        s"((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2})"
      val stopSum = TextAnalysis.Stopwords.map(cnt).mkString(" + ")
      val cases = SampleRates.toSeq.sortBy(_._1)
        .map { case (l, r) => s"WHEN '$l' THEN ${TextAnalysis.rateThreshold(r)}" }
        .mkString(" ")
      s"""WITH corpus AS (
         |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 <> 0),
         |ded AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text, min(doc_id) OVER (PARTITION BY
         |      md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS mn
         |    FROM corpus)
         |  WHERE doc_id = mn),
         |toksA AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents),
         |shA AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(tk) - 2, 1) + 1),
         |    i -> array_to_string(list_slice(tk, i, i + 2), ' ')))) AS s
         |  FROM toksA),
         |bench AS (SELECT DISTINCT s FROM shA WHERE doc_id % 10 = 0),
         |cand AS (SELECT doc_id, s FROM shA WHERE doc_id % 10 <> 0),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
         |  FROM cand GROUP BY 1),
         |ov AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
         |  FROM cand c JOIN bench b ON b.s = c.s GROUP BY 1),
         |cbp AS (
         |  SELECT z.doc_id, CAST(coalesce(floor(o.n_overlap * 10000.0
         |    / z.n_shingles), 0) AS BIGINT) AS cbp
         |  FROM sizes z LEFT JOIN ov o USING (doc_id)),
         |thr AS (SELECT quantile_disc(cbp, ${CorpusContamQuantile}) AS t FROM cbp),
         |dirty AS (SELECT doc_id FROM cbp WHERE cbp > (SELECT t FROM thr)),
         |clean AS (
         |  SELECT * FROM ded WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         |tq AS (
         |  SELECT doc_id, lang, text, concat(' ', text, ' ') AS p,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
         |  FROM clean),
         |mq AS (SELECT doc_id, lang, toks,
         |    CAST($stopSum AS BIGINT) AS stop_hits,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) AS punct,
         |    length(text) AS tl
         |  FROM tq),
         |good AS (
         |  SELECT doc_id, lang, toks FROM mq
         |  WHERE floor((
         |    least(toks / 200.0, 1.0) * 0.4
         |    + least(stop_hits * 10.0 / greatest(toks, 1), 1.0) * 0.4
         |    + greatest(1.0 - (punct * 1.0 / greatest(tl, 1)) * 5.0, 0.0) * 0.2
         |  ) * 10000) >= ${CorpusQualityMinBp}),
         |samp AS (
         |  SELECT doc_id, lang, toks FROM good
         |  WHERE ('0x' || substring(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4))
         |      ::BIGINT <
         |    CASE lang $cases ELSE ${TextAnalysis.rateThreshold(SampleDefaultRate)} END)
         |SELECT lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT)
         |    AS DECIMAL(38,0)) AS VARCHAR) AS id_fp
         |FROM samp GROUP BY 1""".stripMargin
    },

    "c4_pack_sequences" ->
      """WITH t AS (SELECT doc_id, n_chars // 4 + 1 AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |  CAST(coalesce(sum(toks) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
        |  FROM t)
        |SELECT CAST(prior // 2048 AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(toks) AS BIGINT) AS tok_sum
        |FROM c GROUP BY 1""".stripMargin,

    "t9_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(t) - 1, 1) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS s
        |  FROM toks)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(DISTINCT s) AS BIGINT) AS n_distinct,
        |  CAST(floor((1.0 - CAST(count(DISTINCT s) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    * 10000) AS BIGINT) AS rep_bp
        |FROM g GROUP BY doc_id""".stripMargin,

    // t26: replant the %5 self-repeat and %7 word-run, then recompute
    // every Gopher signal relationally — segment/gram group-counts for
    // the duplicate and top metrics, and the duplicated-5-gram char
    // coverage as a true interval union (running prev-end window +
    // generate-series position explode, each position counted once).
    "t26_gopher_repetition" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN t2 || ' spark spark spark spark spark' ELSE t2 END AS text
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN doc_id % 5 = 0 THEN text || ' ' ||
        |          array_to_string(list_slice(
        |            string_split_regex(trim(text), '\s+'), 1, 10), ' ')
        |        ELSE text END AS t2
        |    FROM documents) p),
        |bb AS (
        |  SELECT doc_id, ws, len(ws) AS w,
        |    length(array_to_string(ws, ' ')) AS norm_len
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM f) b),
        |nl AS (SELECT doc_id, CAST(floor((w - 1) / 10.0) AS BIGINT) + 1 AS n_lines FROM bb),
        |lin2 AS (
        |  SELECT l.doc_id,
        |    array_to_string(list_slice(b.ws, l.pos * 10 + 1, l.pos * 10 + 10), ' ') AS seg
        |  FROM (SELECT b2.doc_id, unnest(range(n.n_lines)) AS pos
        |        FROM bb b2 JOIN nl n USING (doc_id)) l
        |  JOIN bb b USING (doc_id)),
        |lc AS (SELECT doc_id, seg, count(*) AS c FROM lin2 GROUP BY 1, 2),
        |lagg AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_cnt,
        |    sum(CASE WHEN c > 1 THEN c * length(seg) ELSE 0 END) AS dup_chars
        |  FROM lc GROUP BY 1),
        |g2 AS (
        |  SELECT g.doc_id, array_to_string(list_slice(b.ws, g.i, g.i + 1), ' ') AS gram
        |  FROM (SELECT doc_id, unnest(range(1, greatest(w - 1, 1) + 1)) AS i FROM bb) g
        |  JOIN bb b USING (doc_id)),
        |g2c AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
        |topc AS (
        |  SELECT doc_id, top_chars FROM (
        |    SELECT doc_id, c * length(gram) AS top_chars,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
        |    FROM g2c) t WHERE rn = 1),
        |g5 AS (
        |  SELECT g.doc_id, g.i, array_to_string(list_slice(b.ws, g.i, g.i + 4), ' ') AS gram
        |  FROM (SELECT doc_id, unnest(range(1, greatest(w - 4, 1) + 1)) AS i FROM bb) g
        |  JOIN bb b USING (doc_id)),
        |g5c AS (SELECT doc_id, gram FROM g5 GROUP BY doc_id, gram HAVING count(*) > 1),
        |iv AS (
        |  SELECT s.doc_id, s.i,
        |    coalesce(max(s.i + 5) OVER (PARTITION BY s.doc_id ORDER BY s.i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1) AS prev_e
        |  FROM (SELECT g5.doc_id, g5.i FROM g5
        |        JOIN g5c ON g5.doc_id = g5c.doc_id AND g5.gram = g5c.gram) s),
        |covc AS (
        |  SELECT c.doc_id, sum(length(b.ws[CAST(c.p AS BIGINT)])) AS chars
        |  FROM (SELECT doc_id, unnest(range(greatest(prev_e, i), i + 5)) AS p FROM iv) c
        |  JOIN bb b USING (doc_id) GROUP BY 1)
        |SELECT b.doc_id, n.n_lines,
        |  CAST(floor(10000.0 * coalesce(l.dup_cnt, 0) / n.n_lines) AS BIGINT) AS dup_line_bp,
        |  CAST(floor(10000.0 * coalesce(l.dup_chars, 0) / b.norm_len) AS BIGINT) AS dup_line_char_bp,
        |  least(CAST(floor(10000.0 * t.top_chars / b.norm_len) AS BIGINT), 10000) AS top_gram_bp,
        |  CAST(floor(10000.0 * coalesce(cc.chars, 0) / (b.norm_len - (b.w - 1))) AS BIGINT) AS dup_gram_bp
        |FROM bb b
        |JOIN nl n USING (doc_id)
        |JOIN topc t USING (doc_id)
        |LEFT JOIN lagg l USING (doc_id)
        |LEFT JOIN covc cc USING (doc_id)""".stripMargin,

    // t27: replant the 8-word line structure + markers with the same
    // modular arithmetic, then re-derive the line retention, the page
    // verdict, and the cleaned text's md5 relationally.
    "t27_c4_filter" ->
      """WITH b AS (
        |  SELECT doc_id, ws, len(ws) AS w FROM (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents) q),
        |lj AS (
        |  SELECT doc_id, ws,
        |    unnest(range(CAST(floor((w - 1) / 8.0) AS BIGINT) + 1)) AS j
        |  FROM b),
        |l2 AS (
        |  SELECT doc_id, j,
        |    CASE WHEN (doc_id + j) % 3 <> 0 THEN ln0 || '.' ELSE ln0 END AS ln
        |  FROM (
        |    SELECT doc_id, j,
        |      CASE WHEN (doc_id * 7 + j) % 11 = 0
        |        THEN array_to_string(list_concat(['javascript'],
        |          list_slice(ws, j * 8 + 2, j * 8 + 8)), ' ')
        |        ELSE array_to_string(list_slice(ws, j * 8 + 1, j * 8 + 8), ' ')
        |      END AS ln0
        |    FROM lj) q),
        |pl AS (
        |  SELECT doc_id, body
        |    || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'config { x }' ELSE '' END
        |    || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
        |    || CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'this mentions badword1 clearly.' ELSE '' END
        |    AS text
        |  FROM (SELECT doc_id, string_agg(ln, chr(10) ORDER BY j) AS body
        |        FROM l2 GROUP BY 1) q),
        |lk AS (
        |  SELECT doc_id, idx, line,
        |    (regexp_matches(line, '[.!?"]$')
        |      AND len(string_split_regex(trim(line), '\s+')) >= 5
        |      AND NOT contains(lower(line), 'javascript')) AS keep
        |  FROM (
        |    SELECT doc_id, idx, sl[idx + 1] AS line FROM (
        |      SELECT doc_id, sl, unnest(range(len(sl))) AS idx FROM (
        |        SELECT doc_id, string_split(text, chr(10)) AS sl FROM pl) q1) q2) q3),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_lines,
        |    sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
        |    coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY idx), '') AS clean
        |  FROM lk GROUP BY 1)
        |SELECT p.doc_id,
        |  CAST(a.n_lines AS BIGINT) AS n_lines,
        |  CAST(a.n_kept AS BIGINT) AS n_kept_lines,
        |  CAST(CASE WHEN a.n_kept >= 3 AND NOT contains(p.text, '{')
        |    AND NOT contains(lower(p.text), 'lorem ipsum')
        |    AND len(list_intersect(string_split_regex(lower(p.text), '[^a-z0-9]+'),
        |      ['badword1', 'badword2'])) = 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS doc_kept,
        |  md5(a.clean) AS clean_md5
        |FROM pl p JOIN agg a USING (doc_id)""".stripMargin,

    // t28: replant bullets/ellipses/symbol/stop-word lines with the same
    // modular arithmetic, then re-derive every quality statistic and the
    // composed keep verdict relationally.
    "t28_gopher_quality" ->
      """WITH b AS (
        |  SELECT doc_id, ws, len(ws) AS w FROM (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents) q),
        |l2 AS (
        |  SELECT doc_id, j,
        |    CASE WHEN (doc_id * 3 + j) % 5 = 0 THEN l1 || ' ...' ELSE l1 END AS ln
        |  FROM (
        |    SELECT doc_id, j,
        |      CASE WHEN (doc_id + j) % 4 = 0 THEN '• ' || l0 ELSE l0 END AS l1
        |    FROM (
        |      SELECT doc_id, j,
        |        array_to_string(list_slice(ws, j * 8 + 1, j * 8 + 8), ' ') AS l0
        |      FROM (SELECT doc_id, ws,
        |              unnest(range(CAST(floor((w - 1) / 8.0) AS BIGINT) + 1)) AS j
        |            FROM b) q1) q2) q3),
        |pl AS (
        |  SELECT doc_id, body
        |    || CASE WHEN doc_id % 6 = 0 THEN chr(10) || '# # # #' ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'and that to of' ELSE '' END
        |    AS text
        |  FROM (SELECT doc_id, string_agg(ln, chr(10) ORDER BY j) AS body
        |        FROM l2 GROUP BY 1) q),
        |wq AS (
        |  SELECT doc_id, count(*) AS w,
        |    sum(length(wd)) AS chars,
        |    sum(CASE WHEN regexp_matches(wd, '[a-zA-Z]') THEN 1 ELSE 0 END) AS alpha
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS wd
        |        FROM pl) q GROUP BY 1),
        |lq AS (
        |  SELECT doc_id, count(*) AS nl,
        |    sum(CASE WHEN ln LIKE '• %' OR ln LIKE '- %' THEN 1 ELSE 0 END) AS bul,
        |    sum(CASE WHEN ln LIKE '%...' OR ln LIKE '%…' THEN 1 ELSE 0 END) AS ell
        |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln
        |        FROM pl) q GROUP BY 1),
        |st AS (
        |  SELECT p.doc_id,
        |    length(p.text) - length(replace(replace(p.text, '#', ''), '…', '')) AS sym,
        |    len(list_intersect(string_split_regex(trim(p.text), '\s+'),
        |      ['the','be','to','of','and','that','have','with'])) AS stops
        |  FROM pl p),
        |m AS (
        |  SELECT w.doc_id, w.w, CAST(floor(100.0 * w.chars / w.w) AS BIGINT) AS mean_c,
        |    CAST(floor(10000.0 * s.sym / w.w) AS BIGINT) AS symbol_bp,
        |    CAST(floor(10000.0 * l.bul / l.nl) AS BIGINT) AS bullet_bp,
        |    CAST(floor(10000.0 * l.ell / l.nl) AS BIGINT) AS ellipsis_bp,
        |    CAST(floor(10000.0 * w.alpha / w.w) AS BIGINT) AS alpha_bp,
        |    CAST(s.stops AS BIGINT) AS stops
        |  FROM wq w JOIN lq l USING (doc_id) JOIN st s USING (doc_id))
        |SELECT doc_id, CAST(w AS BIGINT) AS n_words, mean_c AS mean_wlen_c,
        |  symbol_bp, bullet_bp, ellipsis_bp, alpha_bp, stops AS stop_hits,
        |  CAST(CASE WHEN w >= 50 AND w <= 100000 AND mean_c >= 300
        |    AND mean_c <= 1000 AND symbol_bp <= 1000 AND bullet_bp < 9000
        |    AND ellipsis_bp <= 3000 AND alpha_bp >= 8000 AND stops >= 2
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m""".stripMargin,

    // c9: boundary arithmetic (stride 48, size 64) and chunk text both
    // pinned via the md5 content address.
    "c9_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(list_transform(range(0, ((len(t) - 1) // 48) + 1),
        |    i -> {'chunk_idx': i,
        |          'n_tokens': least(64, len(t) - i * 48),
        |          'chunk_md5': md5(array_to_string(
        |            list_slice(t, i * 48 + 1, i * 48 + 64), ' '))})) AS ch
        |  FROM toks)
        |SELECT doc_id, CAST(ch.chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(ch.n_tokens AS BIGINT) AS n_tokens, ch.chunk_md5 AS chunk_md5
        |FROM c""".stripMargin,

    // t21: exact heavy-hitter census + constant flags — the MG summary's
    // guarantees are deterministic even though its content is not.
    "t21_heavy_hitters" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tot AS (SELECT count(*) AS n FROM w),
        |ex AS (SELECT term, count(*) AS cnt FROM w GROUP BY term)
        |SELECT CAST(count(*) AS BIGINT) AS n_heavy,
        |  CAST(1 AS BIGINT) AS all_found, CAST(1 AS BIGINT) AS bounds_ok
        |FROM ex, tot WHERE cnt * 129 > n""".stripMargin,

    // t22: t21's gate verbatim — the folded streaming sketch must honor
    // the identical deterministic guarantees.
    "t22_stream_hh" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tot AS (SELECT count(*) AS n FROM w),
        |ex AS (SELECT term, count(*) AS cnt FROM w GROUP BY term)
        |SELECT CAST(count(*) AS BIGINT) AS n_heavy,
        |  CAST(1 AS BIGINT) AS all_found, CAST(1 AS BIGINT) AS bounds_ok
        |FROM ex, tot WHERE cnt * 129 > n""".stripMargin,

    "t10_top_terms" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS cnt
        |FROM w GROUP BY term
        |ORDER BY cnt DESC, term LIMIT 100""".stripMargin,

    "c5_sample_k" ->
      """SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 40""".stripMargin,

    "t11_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |freq AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(CAST(c AS DOUBLE) / tot)), 6) AS logprob
        |FROM toks JOIN freq USING (term) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    "t12_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    round(tf * ln(n / df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, term, rank, score FROM ranked WHERE rank <= 3""".stripMargin,

    // t15: IN list mirrors Bm25Query; k1=1.2 b=0.75 inlined. Scores
    // rounded to 6dp before ranking (t12 discipline), id tiebreak.
    "t15_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    avg(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)) AS avgdl
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY 1),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('hash', 'join', 'vector', 'stream', 'slow')
        |  GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT doc_id,
        |    round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
        |      * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
        |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY doc_id),
        |ranked AS (
        |  SELECT doc_id, bm25,
        |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, bm25, rank FROM ranked WHERE rank <= 20""".stripMargin,

    "c6_temperature_mix" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, pow(n, 0.5) AS w FROM n),
        |q AS (
        |  SELECT lang,
        |    CAST(floor(round(300.0 * w / (SELECT sum(w) FROM w), 6)) AS BIGINT) AS quota
        |  FROM w),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS sample_rank
        |  FROM documents)
        |SELECT lang, doc_id, sample_rank
        |FROM ranked JOIN q USING (lang)
        |WHERE sample_rank <= quota""".stripMargin,

    "t17_freq_spectrum" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |tc AS (SELECT w, count(*) AS c FROM toks GROUP BY 1)
        |SELECT c AS term_freq, count(*) AS n_terms FROM tc GROUP BY 1""".stripMargin,

    // t19: both engines run the same regex chain ('g' flag = Spark's
    // default replace-all), so the hash judges the transformation itself.
    "t19_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '<html><p class="x">' || text || '</p> <br/></html>'
        |      ELSE text END AS html
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
        |    trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, n_tags, clean,
        |  CAST(length(clean) AS BIGINT) AS clean_chars
        |FROM s""".stripMargin,

    // t18: identical arithmetic association to the engine (p, q, m built
    // from the same double divisions, ln on the same quotients), each
    // term fixed-pointed to micro-units before the exact integer sum.
    "t18_js_div" ->
      """WITH toks AS (
        |  SELECT (lang = 'en') AS a,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |c AS (
        |  SELECT w, sum(CASE WHEN a THEN 1 ELSE 0 END) AS a_n,
        |    sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS b_n
        |  FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(a_n) AS DOUBLE) AS at,
        |               CAST(sum(b_n) AS DOUBLE) AS bt FROM c),
        |k AS (
        |  SELECT a_n, b_n,
        |    CASE WHEN a_n > 0 THEN 0.5 * (a_n / at)
        |      * ln((a_n / at) / (((a_n / at) + (b_n / bt)) / 2.0))
        |      ELSE 0.0 END
        |    + CASE WHEN b_n > 0 THEN 0.5 * (b_n / bt)
        |      * ln((b_n / bt) / (((a_n / at) + (b_n / bt)) / 2.0))
        |      ELSE 0.0 END AS x
        |  FROM c CROSS JOIN tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(a_n) AS BIGINT) AS a_tokens,
        |  CAST(sum(b_n) AS BIGINT) AS b_tokens,
        |  CAST(sum(CAST(round(x * 1000000.0) AS BIGINT)) AS BIGINT) AS js_micro
        |FROM k""".stripMargin,

    // t16: lockstep multi-unnest builds the same 1-shift bigrams; formula
    // association mirrors the query exactly (6dp round-before-rank).
    "t16_pmi" ->
      """WITH arr AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS a FROM documents),
        |toks AS (SELECT unnest(a) AS w FROM arr),
        |uni AS (SELECT w, count(*) AS n FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
        |btot AS (
        |  SELECT CAST(sum(greatest(len(a) - 1, 0)) AS DOUBLE) AS b FROM arr),
        |bi AS (
        |  SELECT unnest(a[1:len(a)-1]) AS w1, unnest(a[2:len(a)]) AS w2
        |  FROM arr),
        |bc AS (
        |  SELECT w1, w2, count(*) AS n_ab FROM bi
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |scored AS (
        |  SELECT w1, w2, n_ab,
        |    round(ln((n_ab * t * t) / (b * u1.n * u2.n)), 6) AS pmi
        |  FROM bc
        |  JOIN uni u1 ON bc.w1 = u1.w
        |  JOIN uni u2 ON bc.w2 = u2.w
        |  CROSS JOIN tot CROSS JOIN btot),
        |ranked AS (
        |  SELECT w1, w2, n_ab, pmi,
        |    CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT w1, w2, n_ab, pmi, rank FROM ranked WHERE rank <= 50""".stripMargin,

    // c11: '0x'-cast 48-bit prefix is the portable twin of Spark's conv()
    // (a9/c8 discipline); draw string ordering is plain lexicographic on
    // both engines (hex alphabet).
    "c11_corpus_shuffle" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS draw
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, draw,
        |    ('0x' || substr(draw, 1, 12))::BIGINT % 8 AS shard
        |  FROM d)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY draw, doc_id)
        |    AS BIGINT) AS pos
        |FROM s""".stripMargin,

    // c10: rates re-derived relationally; the '0x'-cast 48-bit md5 draw
    // is the portable twin of Spark's conv() (a9/c8 discipline). CASE
    // arms mirror MixtureShares literally.
    "c10_mixture" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |shared AS (
        |  SELECT lang, n, CAST(CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.25
        |      WHEN 'de' THEN 0.15 WHEN 'es' THEN 0.10 WHEN 'fr' THEN 0.10
        |      END AS DOUBLE) AS share
        |  FROM counts WHERE share IS NOT NULL),
        |rates AS (
        |  SELECT lang, least(CAST(1.0 AS DOUBLE),
        |    share * (SELECT greatest(count(*) // 2, 1) FROM documents) / n) AS r
        |  FROM shared)
        |SELECT d.lang, d.doc_id
        |FROM documents d JOIN rates USING (lang)
        |WHERE (CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 12))
        |    AS BIGINT) + 1) / 281474976710656.0 <= r""".stripMargin,

    // c14: exact-integer recomputation — token counts, budget `//`
    // chain, and the HUGEINT cross-multiplied keep test (HUGEINT ≡ the
    // engine's DECIMAL(38,0); '0x' casts to BIGINT first — DuckDB 1.0's
    // hex cast doesn't reach INT128).
    "c14_token_budget" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM base),
        |ct AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tc
        |  FROM base GROUP BY 1),
        |sh AS (SELECT * FROM (VALUES ('en', 5000), ('zh', 2000),
        |  ('es', 1500), ('de', 1000)) s(lang, share_bp)),
        |cats AS (SELECT ct.lang, ct.tc,
        |  ((((SELECT t FROM tot) * 4000) // 10000) * sh.share_bp) // 10000 AS bc
        |  FROM ct JOIN sh USING (lang))
        |SELECT b.doc_id, b.lang, b.n_tokens,
        |  CAST(CASE WHEN cats.bc IS NOT NULL AND
        |    (('0x' || substring(md5(CAST(b.doc_id AS VARCHAR)),1,12))::BIGINT)::HUGEINT
        |      * cats.tc < cats.bc::HUGEINT * 281474976710656
        |    THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM base b LEFT JOIN cats USING (lang)""".stripMargin,

    "c7_pack_shards" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (
        |      PARTITION BY CAST(floor(n_chars / 50) AS BIGINT)
        |      ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT CAST((rn - 1) % 8 AS BIGINT) AS shard_id,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM r GROUP BY 1""".stripMargin,

    // c8: the oracle re-derives the same content-addressed ES keys (9dp
    // round-before-rank, doc_id tiebreak) and takes the same top-100.
    "c8_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, lang, n_chars,
        |    round(-ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 12))
        |        AS BIGINT) + 1) / 281474976710656.0) / n_chars, 9) AS es_key
        |  FROM documents
        |  WHERE n_chars > 0)
        |SELECT doc_id, lang, n_chars FROM s
        |ORDER BY es_key, doc_id LIMIT 100""".stripMargin,

    "t13_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |c AS (SELECT doc_id, ch, count(*) AS c FROM ch WHERE len(ch) > 0 GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_counted,
        |  round(ln(CAST(sum(c) AS DOUBLE))
        |    - sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE), 6) AS entropy
        |FROM c GROUP BY 1""".stripMargin,

    // t14: the oracle recomputes the linear model with an explode + join
    // (the formulation the compiled kernel replaces); the VALUES list
    // mirrors QualityVocab literally.
    "t14_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |u AS (SELECT doc_id, len(t) AS n, unnest(t) AS w FROM toks),
        |vocab(w, wt) AS (VALUES
        |  ('vector', 200), ('query', 150), ('data', 120), ('stream', 110),
        |  ('join', 90), ('window', 80), ('hash', 60), ('sort', 40),
        |  ('slow', -250), ('dup', -400), ('big', -50), ('small', -30),
        |  ('a', -20), ('the', -10)),
        |s AS (SELECT u.doc_id, any_value(u.n) AS n_toks,
        |    coalesce(sum(v.wt), 0) AS w_sum
        |  FROM u LEFT JOIN vocab v USING (w) GROUP BY u.doc_id)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |  CAST(-50 + floor(w_sum * 1.0 / n_toks) AS BIGINT) AS logit_bp,
        |  CAST(CAST(-50 + floor(w_sum * 1.0 / n_toks) AS BIGINT) >= -34 AS INT)
        |    AS keep
        |FROM s""".stripMargin,

    // t24: full relational recomputation — train-slice unigram/bigram
    // counts, the Stupid-Backoff branch per score-slice position, the
    // same round(ln·10⁶)-before-sum fixed point.
    "t24_bigram_lm" ->
      """WITH tr AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS a FROM documents
        |  WHERE doc_id % 2 = 0),
        |uni AS (SELECT unnest(a) AS w FROM tr),
        |uc AS (SELECT w, count(*) AS cu FROM uni GROUP BY 1),
        |nv AS (SELECT CAST(sum(cu) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS v FROM uc),
        |bc AS (
        |  SELECT w1, w2, count(*) AS cb FROM (
        |    SELECT unnest(a[1:len(a)-1]) AS w1, unnest(a[2:len(a)]) AS w2
        |    FROM tr)
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS a
        |  FROM documents WHERE doc_id % 2 = 1),
        |pos AS (
        |  SELECT doc_id, unnest(a[1:len(a)-1]) AS w1, unnest(a[2:len(a)]) AS w2
        |  FROM sc),
        |term AS (
        |  SELECT pos.doc_id,
        |    CAST(round(ln(CASE WHEN bc.cb IS NOT NULL
        |      THEN bc.cb * 1.0 / u1.cu
        |      ELSE 0.4 * (coalesce(u2.cu, 0) + 1) / (nv.n + nv.v) END)
        |      * 1000000) AS BIGINT) AS m
        |  FROM pos
        |  LEFT JOIN bc ON bc.w1 = pos.w1 AND bc.w2 = pos.w2
        |  LEFT JOIN uc u1 ON u1.w = pos.w1
        |  LEFT JOIN uc u2 ON u2.w = pos.w2
        |  CROSS JOIN nv)
        |SELECT s.doc_id,
        |  CAST(coalesce(t.nb, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(t.lm, 0) AS BIGINT) AS lm_micro
        |FROM (SELECT DISTINCT doc_id FROM sc) s
        |LEFT JOIN (SELECT doc_id, count(*) AS nb, sum(m) AS lm
        |  FROM term GROUP BY 1) t
        |  USING (doc_id)""".stripMargin,

    // t23: the conservation law is the exact cross-engine value — Σ BPE
    // token lengths must equal the corpus' non-whitespace code points;
    // the quality/stability gates are engine-side constants (the oracle
    // cannot run BPE, so it pins the invariants instead — the d7/e6
    // constant-oracle discipline; the merge semantics themselves are
    // pinned by TextAnalysisSpec's closed-form fixtures).
    "t23_bpe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(regexp_replace(text, '\s+', '', 'g'))) AS BIGINT)
        |    AS n_chars_total,
        |  CAST(1 AS BIGINT) AS compress_ok,
        |  CAST(1 AS BIGINT) AS bounds_ok,
        |  CAST(1 AS BIGINT) AS stable_ok
        |FROM documents""".stripMargin,

    // c18: the next-fit fold replayed verbatim — one row per recursion
    // step in (bucket, id) order carrying (pack, fill), pack resetting
    // at bucket seams; d/o MATERIALIZED (the e15 lesson: an inlined CTE
    // re-evaluates per step).
    "c18_pack_atomic" ->
      """WITH RECURSIVE d AS MATERIALIZED (
        |  SELECT doc_id, n_chars//4 + 1 AS toks,
        |    (doc_id - (SELECT min(doc_id) FROM documents)) //
        |      greatest(((SELECT max(doc_id) - min(doc_id) + 1 FROM documents)
        |        + 7) // 8, 1) AS bucket
        |  FROM documents),
        |o AS MATERIALIZED (
        |  SELECT d.*, row_number() OVER (ORDER BY bucket, doc_id) AS rn FROM d),
        |fold AS (
        |  SELECT rn, doc_id, toks, bucket, CAST(0 AS BIGINT) AS pack,
        |    toks AS fill
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.rn, o.doc_id, o.toks, o.bucket,
        |    CASE WHEN o.bucket <> f.bucket THEN CAST(0 AS BIGINT)
        |         WHEN f.fill + o.toks <= 1024 THEN f.pack
        |         ELSE f.pack + 1 END,
        |    CASE WHEN o.bucket <> f.bucket THEN o.toks
        |         WHEN f.fill + o.toks <= 1024 THEN f.fill + o.toks
        |         ELSE o.toks END
        |  FROM fold f JOIN o ON o.rn = f.rn + 1)
        |SELECT doc_id, CAST(toks AS BIGINT) AS toks,
        |  CAST(bucket AS BIGINT) AS bucket, pack,
        |  CAST(toks > 1024 AS BIGINT) AS over_budget
        |FROM fold""".stripMargin,

    // t25: t23's constant-oracle class for the Unigram-LM tokenizer —
    // char conservation is the exactly-recomputable leg; compression/
    // bounds/stability/vocab shape are engine-gated invariants (the EM
    // fit itself is pinned by TextAnalysisSpec's closed-form fixture).
    "t25_unigram" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(regexp_replace(text, '\s+', '', 'g'))) AS BIGINT)
        |    AS n_chars_total,
        |  CAST(1 AS BIGINT) AS compress_ok,
        |  CAST(1 AS BIGINT) AS bounds_ok,
        |  CAST(1 AS BIGINT) AS stable_ok,
        |  CAST(1 AS BIGINT) AS vocab_ok
        |FROM documents""".stripMargin,
  )
}
