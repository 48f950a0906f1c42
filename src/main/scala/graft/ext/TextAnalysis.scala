package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is a pure per-row projection built from codegen'd
  * built-ins (no UDFs): at 100 TB these run inside whole-stage codegen in
  * the same pass as the scan — the cost is I/O-bound, exactly what you want
  * for a corpus sweep. Outputs are bigint/double/string so results join
  * cheaply with downstream filters.
  */
object TextAnalysis {

  /** Whitespace token count. Empty/blank text → 0. */
  def tokenCountWs(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token (a cheap, deterministic
    * stand-in for a real subword tokenizer). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0))).cast("long")

  /** Count non-overlapping occurrences of a literal substring —
    * (len(s) - len(replace(s, sub, ''))) / len(sub); portable arithmetic
    * identical to the DuckDB oracle's. */
  def substrCount(c: Column, sub: String): Column =
    ((length(c) - length(replace(c, lit(sub), lit("")))) / lit(sub.length)).cast("long")

  /** Stopword hits: occurrences of a small English stopword set, counted as
    * space-bounded substrings. */
  val Stopwords = Seq("the", "a", "of", "and", "to", "in")
  def stopwordHits(c: Column): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    Stopwords.map(w => substrCount(padded, s" $w ")).reduce(_ + _)
  }

  /** Punctuation character count over an explicit class (kept identical in
    * the oracle SQL; engines disagree on \p{Punct}). */
  val PunctClass = """[.,;:!?'"()\[\]{}-]"""
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, PunctClass, ""))).cast("long")

  /** Document quality score in [0,1]: blends length saturation, stopword
    * density, and punctuation sanity. Deterministic, portable arithmetic
    * (least/greatest instead of branches); callers quantize (e.g.
    * floor(x*10⁴)) when the double crosses an engine boundary. */
  def qualityScore(c: Column): Column = {
    val toks = tokenCountWs(c).cast("double")
    val lenScore = least(toks / lit(200.0), lit(1.0))
    val stopScore = least(stopwordHits(c).cast("double") * lit(10.0) / greatest(toks, lit(1.0)), lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(length(c).cast("double"), lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio * lit(5.0), lit(0.0))
    lenScore * lit(0.4) + stopScore * lit(0.4) + punctScore * lit(0.2)
  }

  /** Model-based quality classification: the fastText/DCLM-style filter
    * that follows the heuristic signals in a curation pipeline — a
    * trained linear model reduced to a token → integer-bp weight table,
    * mean-pooled over the document and thresholded into a keep decision.
    * `logit_bp = biasBp + floor(Σ w_bp(token) / n_tokens)`; sigmoid is
    * deliberately NOT applied (it is monotone, so the keep threshold is
    * equivalent in logit space, and libm `exp` differs across engines —
    * the bp logit stays integer-exact for the oracle).
    *
    * One zero-shuffle scan projection via the compiled
    * [[graft.functions.TextExpressions.VocabScoreBp]] kernel; the vocab
    * rides the plan as a reference object (a few MB for a real 10⁵-token
    * model — executor-resident, no join, no shuffle). */
  def classifierScore(docs: DataFrame, id: String, text: String,
                      vocab: Map[String, Long], biasBp: Long,
                      keepBp: Long): DataFrame = {
    val sc = graft.functions.TextExpressions.vocabScoreBp(col(text), vocab)
    docs.select(col(id), sc.as("_s"))
      .select(col(id), col("_s.n_toks").as("n_toks"),
        // Column `/` is double division; |w_sum| <= 1e4 * n stays exact
        (lit(biasBp) + floor(col("_s.w_sum") / col("_s.n_toks")))
          .cast("long").as("logit_bp"))
      .withColumn("keep", (col("logit_bp") >= lit(keepBp)).cast("int"))
  }

  /** Language-ID heuristic: marker-word hit counts per language; argmax
    * with deterministic tie-break (alphabetical, 'und' when all zero).
    * A real pipeline would swap in fastText/CLD3 behind the same column
    * contract; the heuristic keeps the operator dependency-free. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "que", "y"),
    "fr" -> Seq("le", "les", "et", "est"))

  def langId(c: Column): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val scores = LangMarkers.map { case (lang, ws) =>
      lang -> ws.map(w => substrCount(padded, s" $w ")).reduce(_ + _)
    }
    // argmax by (score desc, lang asc): fold over languages in order
    val best = scores.foldLeft((lit("und"), lit(0L))) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    best._1
  }

  /** Document fingerprint: md5 of the whitespace-collapsed, lowercased,
    * trimmed text — a canonical-form exact-dup key (rolling-hash analog
    * that stays portable to the DuckDB oracle). */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** PII redaction for training corpora: emails, SSNs, and US-style phone
    * numbers replaced with typed placeholder tokens (the curation step
    * between dedup and tokenization — leaked PII survives training, so it
    * is scrubbed at corpus build time, as one codegen'd projection per
    * document). Patterns are deliberately simple, explicit, and kept
    * IDENTICAL in the SQL oracle — engines disagree on \b and \p classes,
    * so the character classes are spelled out. Order matters: emails are
    * redacted before phones so a phone-like digit run inside an address
    * is consumed by the email rule. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val SsnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  // area-code separator optional ("(555)123-4567"), second separator may
  // be a space ("555 123 4567"); a bare 10-digit run stays unredacted on
  // purpose (ids/timestamps would false-positive)
  val PhonePattern = "[(]?[0-9]{3}[)]?[-. ]?[0-9]{3}[-. ][0-9]{4}"

  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, EmailPattern, "<EMAIL>")
    val noSsn = regexp_replace(noEmail, SsnPattern, "<SSN>")
    regexp_replace(noSsn, PhonePattern, "<PHONE>")
  }

  /** Deterministic dataset split by content hash — the standard
    * train/val/test assignment for corpus builds: stable across runs,
    * machines, and partitionings (a document's split follows its KEY, so
    * re-ingesting the corpus never migrates examples between splits — the
    * property random() sampling lacks). The hash is the first 4 hex
    * digits of md5(key) mapped to [0, 65536), compared against cumulative
    * fraction thresholds; md5 keeps the assignment reproducible in ANY
    * engine (the DuckDB oracle recomputes it exactly).
    *
    * `fractions` are (label, weight) pairs; weights are normalized, the
    * last label absorbs rounding. */
  def hashSplit(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0))
    val total = fractions.map(_._2).sum
    val bucket = conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => math.round(f * 65536).toInt)
    fractions.init.zip(cuts).reverse.foldLeft(lit(fractions.last._1)) {
      case (els, ((label, _), cut)) => when(bucket < cut, lit(label)).otherwise(els)
    }
  }

  /** Count of redactions ACTUALLY applied (corpus-quality accounting):
    * each pattern is counted on the text as [[redactPii]]'s sequential
    * rules see it (emails on the original, SSNs after email redaction,
    * phones after both) — so a digit run inside an already-redacted email
    * is never double-counted, and a literal "<EMAIL>" present in the
    * SOURCE text is never miscounted as a redaction. */
  def piiHits(c: Column): Column = {
    val emails = size(regexp_extract_all(c, lit(EmailPattern), lit(0)))
    val afterEmail = regexp_replace(c, EmailPattern, "<EMAIL>")
    val ssns = size(regexp_extract_all(afterEmail, lit(SsnPattern), lit(0)))
    val afterSsn = regexp_replace(afterEmail, SsnPattern, "<SSN>")
    val phones = size(regexp_extract_all(afterSsn, lit(PhonePattern), lit(0)))
    (emails + ssns + phones).cast("long")
  }

  /** Integer threshold (out of 65536) a rate maps to — shared by the
    * sampling predicate and the oracle SQL so both compare the hash
    * against the SAME literal integer (never each engine's own
    * float-to-int rounding). */
  def rateThreshold(rate: Double): Int = {
    require(rate >= 0 && rate <= 1, s"rate out of [0,1]: $rate")
    math.round(rate * 65536).toInt
  }

  /** Deterministic stratified sampling predicate: keep a row iff
    * md5(stratum ":" key) maps below its stratum's rate threshold — the
    * training-mixture downsampler (e.g. keep 50% of English, 10% of the
    * tail). Like [[hashSplit]], membership follows the (stratum, key)
    * pair: stable across runs, partitionings, and engines, and a stratum's
    * sample at rate r is a SUBSET of its sample at r' > r (thresholds
    * nest). Pure codegen'd projection — no shuffle, no state. */
  def stratifiedSampleFilter(stratum: Column, key: Column,
                             rates: Map[String, Double],
                             defaultRate: Double): Column = {
    val bucket = conv(substring(
      md5(concat(stratum, lit(":"), key.cast("string"))), 1, 4), 16, 10).cast("long")
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(rateThreshold(defaultRate))) {
      case (els, (label, r)) => when(stratum === label, lit(rateThreshold(r))).otherwise(els)
    }
    bucket < thr
  }

  /** Deterministic exact-k per-stratum sample: keep the k rows of each
    * stratum with the smallest `md5(stratum:key)` — a content-addressed
    * "random" draw that is stable across runs, partitionings, and engines
    * (same family as [[hashSplit]]/[[stratifiedSampleFilter]], which give
    * RATE-based membership; this gives exact COUNTS, the form a training
    * mixture with per-source quotas needs). Output: input columns +
    * `sample_rank` (1-based within the stratum).
    *
    * Shape: one shuffle on the stratum + a per-stratum rank window. A
    * stratum's sort spills rather than OOMs on huge strata; when k is
    * tiny and strata are few, a bounded top-k aggregate
    * (functions.TopKAggregate) trades the sort for O(k) state per group —
    * this form keeps the whole input row, which the aggregate cannot. */
  def sampleKPerStratum(df: org.apache.spark.sql.DataFrame, stratum: String,
                        key: String, k: Int): org.apache.spark.sql.DataFrame = {
    val draw = md5(concat(col(stratum), lit(":"), col(key).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratum)).orderBy(draw, col(key))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Temperature-scaled mixture resampling (the multilingual-corpus
    * balancing op): stratum s with share p_s of the corpus receives a
    * quota of `floor(targetTotal * p_s^(1/T) / Z)` documents, where
    * `Z = Σ p^(1/T)` — T=1 keeps natural proportions, T→∞ tends uniform,
    * T<1 sharpens toward the head. Membership inside each quota is the
    * same content-addressed md5 draw as [[sampleKPerStratum]], so the
    * chosen documents are stable across runs, partitionings, and engines.
    *
    * Shape: one count aggregate over strata (tiny), quota arithmetic on
    * that aggregate, broadcast of the per-stratum quotas back onto the
    * rank window's output — one data shuffle total. The power/division
    * chain rounds to 6dp before floor so cross-engine 1-ulp pow()
    * differences cannot flip a quota. Output: rows + `sample_rank`.
    */
  def temperatureSample(df: org.apache.spark.sql.DataFrame, stratum: String,
                        key: String, targetTotal: Long,
                        temperature: Double): org.apache.spark.sql.DataFrame = {
    require(temperature > 0, "temperatureSample: temperature must be positive")
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("_n"))
    val powed = counts.withColumn("_w", pow(col("_n").cast("double"), lit(1.0 / temperature)))
    val quotas = powed
      .crossJoin(broadcast(powed.agg(sum(col("_w")).as("_z"))))
      .select(col(stratum),
        floor(round(lit(targetTotal.toDouble) * col("_w") / col("_z"), 6)).as("_quota"))
    val draw = md5(concat(col(stratum), lit(":"), col(key).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratum)).orderBy(draw, col(key))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(stratum))
      .filter(col("sample_rank") <= col("_quota"))
      .drop("_quota")
  }

  /** Corpus mixture resampling to EXPLICIT target shares — the "data
    * mixing" step of training-corpus construction (the Pile / Dolma /
    * RedPajama recipe tables): category c contributes ~`shares(c)` of
    * `targetTotal` documents, drawn deterministically and without
    * replacement; categories absent from `shares` are excluded; a share
    * over-asking its category saturates (rate clamps to 1 — epoch
    * oversampling is a downstream repeat, not a sampler concern).
    *
    * Scale shape, deliberately DIFFERENT from [[temperatureSample]]'s
    * exact-quota window: rates come from one tiny per-category count
    * aggregate broadcast back, and acceptance is a content-addressed
    * Bernoulli threshold (`u48(key) <= share·total/n_c`) evaluated in
    * the scan stage — no per-category `row_number`, whose sort skews
    * precisely when one category dominates the corpus (the common case:
    * English). The trade is binomial noise around each quota instead of
    * an exact count; the draw stays deterministic per document, so the
    * selected set is stable across runs, partitionings, and engines. */
  def mixtureSample(df: org.apache.spark.sql.DataFrame, stratum: String,
                    key: String, shares: Map[String, Double],
                    targetTotal: Long,
                    salt: String = "mix"): org.apache.spark.sql.DataFrame = {
    require(shares.values.forall(_ >= 0), "mixtureSample: negative share")
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("_n"))
    val shareCol = shares.foldLeft(lit(null).cast("double")) {
      case (acc, (cat, s)) => when(col(stratum) === cat, lit(s)).otherwise(acc)
    }
    // filter BEFORE the clamp: least() skips NULLs (both engines), so an
    // unlisted category would otherwise clamp to rate 1.0 and sail through
    val rates = counts
      .select(col(stratum), shareCol.as("_share"), col("_n"))
      .filter(col("_share").isNotNull)
      .select(col(stratum),
        least(lit(1.0), col("_share") * lit(targetTotal) / col("_n")).as("_r"))
    val u = (conv(substring(
        md5(concat(lit(salt), lit(":"), col(key).cast("string"))), 1, 12),
      16, 10).cast("double") + 1) / lit(281474976710656.0) // (0, 1]
    df.join(broadcast(rates), Seq(stratum))
      .filter(u <= col("_r"))
      .drop("_r")
  }

  /** Token-budget mixture sampling — the data-mixing recipe denominated
    * in TOKENS, not documents (training mixes are token-shares: DoReMi,
    * the Llama/GPT data cards): given a global token budget (`budgetBp`
    * of the corpus' tokens) and explicit per-category token shares,
    * derive each category's keep-rate and draw documents
    * content-addressed. Categories without a share are EXCLUDED
    * (kept=0), [[mixtureSample]]'s rule.
    *
    * No float rate ever exists: budgets are exact integer `div` chains,
    * and the keep test cross-multiplies the 48-bit md5 draw against the
    * category's token count in DECIMAL(38,0) —
    * `draw·T_c < B_c·2^48 ⟺ draw/2^48 < B_c/T_c` — so engines and
    * partitionings agree bit for bit (the t18 discipline applied to a
    * sampling predicate). Shape: two map-side-combinable aggregates
    * (corpus total + per-category totals, category-domain-sized
    * shuffles); the keep decision joins a broadcast category frame and
    * rides the scan. Output: id, category, n_tokens, kept. */
  def tokenBudgetSample(docs: org.apache.spark.sql.DataFrame, id: String,
                        text: String, category: String, budgetBp: Int,
                        sharesBp: Seq[(String, Int)]): org.apache.spark.sql.DataFrame = {
    require(budgetBp >= 0 && budgetBp <= 10000, s"budgetBp out of range: $budgetBp")
    require(sharesBp.forall(_._2 >= 0) && sharesBp.map(_._2).sum <= 10000,
      "sharesBp must be non-negative and sum to <= 10000")
    val spark = docs.sparkSession
    import spark.implicits._
    val nTok = size(split(trim(col(text)), "\\s+")).cast("long")
    val base = docs.select(col(id), col(category).as("__cat"), nTok.as("n_tokens"))
    val tot = base.agg(sum(col("n_tokens")).as("__t"))
    val catTok = base.groupBy(col("__cat")).agg(sum(col("n_tokens")).as("__tc"))
    val shareDf = sharesBp.toDF("__cat", "__share_bp")
    val cats = catTok.join(broadcast(shareDf), Seq("__cat"))
      .crossJoin(broadcast(tot))
      .select(col("__cat"), col("__tc"),
        expr(s"(((__t * ${budgetBp}L) div 10000) * __share_bp) div 10000")
          .as("__bc"))
    val draw = conv(substring(md5(col(id).cast("string")), 1, 12), 16, 10)
      .cast("decimal(38,0)")
    base.join(broadcast(cats), Seq("__cat"), "left")
      .select(col(id), col("__cat").as(category), col("n_tokens"),
        when(col("__bc").isNotNull &&
          draw * col("__tc").cast("decimal(38,0)") <
            col("__bc").cast("decimal(38,0)") *
              lit(281474976710656L).cast("decimal(38,0)"),
          lit(1L)).otherwise(lit(0L)).as("kept"))
  }

  /** Quality-weighted sampling WITHOUT replacement (Efraimidis–Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): every row
    * draws a deterministic pseudo-uniform u ∈ (0,1] from the 48-bit
    * md5(salt:key) integer and ranks by `-ln(u) / weight`; the k smallest
    * keys are an exact weighted sample without replacement. The draw is
    * content-addressed, so the same rows are chosen across runs,
    * partitionings, and engines (same discipline as [[sampleKPerStratum]]).
    *
    * Shape: a pure scan projection + global top-k
    * (`TakeOrderedAndProject` — per-partition heaps, never a full sort),
    * so it scales like a filter. The ES key rounds to 9dp BEFORE ranking,
    * row key as tiebreak — cross-engine 1-ulp ln() differences collapse
    * into exact ties instead of rank flips. Non-positive weights are
    * excluded (they would otherwise always win). */
  def weightedSample(df: org.apache.spark.sql.DataFrame, key: String,
                     weightCol: String, k: Int,
                     salt: String = "ws"): org.apache.spark.sql.DataFrame = {
    val u = (conv(substring(
        md5(concat(lit(salt), lit(":"), col(key).cast("string"))), 1, 12),
      16, 10).cast("double") + 1) / lit(281474976710656.0) // / 2^48 → (0, 1]
    val esKey = round(-log(u) / col(weightCol).cast("double"), 9)
    // Output: the input columns only — the internal ranking key is
    // projected away inside the TakeOrderedAndProject, not returned
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", esKey)
      .orderBy(col("es_key"), col(key))
      .limit(k)
      .drop("es_key")
  }

  /** Character-level Shannon entropy per document (nats, 6dp) — the
    * cheap gibberish/encoding-noise detector: natural text sits in a
    * narrow entropy band, base64/binary spills above it, repeated-char
    * junk falls below.
    *
    * Computed as `H = ln(n) − (Σ c·ln c)/n` over per-character counts, so
    * the plan is explode → ONE map-side-combining aggregate on (id, char)
    * (the exchange carries distinct pairs, not characters) → one per-id
    * aggregate. Both engines sum the same rounded ln() terms. */
  def charEntropy(docs: org.apache.spark.sql.DataFrame, id: String,
                  text: String): org.apache.spark.sql.DataFrame = {
    // filter guards the Java split artifact (a trailing "" element) so
    // both engines count exactly the text's characters
    val chars = docs.select(col(id), explode(split(col(text), "")).as("ch"))
      .filter(length(col("ch")) > 0)
    val counts = chars.groupBy(col(id), col("ch")).agg(count(lit(1)).as("_c"))
    counts.groupBy(col(id))
      .agg(
        sum(col("_c")).as("n_chars_counted"),
        round(
          log(sum(col("_c")).cast("double")) -
            sum(col("_c").cast("double") * log(col("_c").cast("double")))
              / sum(col("_c")).cast("double"),
          6).as("entropy"))
  }

  /** Per-document unigram log-probability (the cheap, deterministic
    * stand-in for LM-perplexity quality filtering): score(doc) = mean over
    * its whitespace tokens of ln(corpus_count(token) / corpus_tokens).
    * Rare-token-heavy documents score low; boilerplate scores high.
    *
    * Shape: token explode → one map-side-combining count aggregate (the
    * exchange carries one row per DISTINCT term, not per token) → join the
    * exploded tokens back on term → per-doc mean. The term-frequency table
    * is corpus-sized vocabulary (not corpus-sized text), but at 100 TB it
    * is still too big to broadcast — the term join is a plain shuffle
    * join on a Zipf-skewed key, which AQE's skew split handles; the
    * corpus-total is a 1-row broadcast. Output: id, n_tokens,
    * logprob (ln, rounded to 6dp — both engines' float sums agree there).
    */
  def unigramLogProb(docs: org.apache.spark.sql.DataFrame, id: String,
                     text: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(id), explode(split(trim(col(text)), "\\s+")).as("term"))
    val freq = toks.groupBy(col("term")).agg(count(lit(1)).as("_c"))
    val total = freq.agg(sum(col("_c")).as("_tot"))
    toks
      .join(freq, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("_c").cast("double") / col("_tot").cast("double"))), 6)
          .as("logprob"))
  }

  /** Bigram-LM quality scoring with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation") — the
    * perplexity-filter shape: an LM counted on `train` scores each
    * `score` document. Per bigram position (w1, w2):
    *   p = c(w1,w2) / c(w1)            when the LM saw the bigram
    *     = 0.4 · (c(w2)+1) / (N+V)     otherwise (Laplace unigram tier,
    *                                    so train-unseen words stay finite)
    * and the per-doc score is the sum of round(ln(p)·10⁶) — each term
    * fixed-pointed to micro-units BEFORE the sum ([[unigramJsDivergence]]'s
    * discipline: summation order can never move the scalar, so the result
    * is partitioning-independent).
    *
    * Shape: two count aggregates over the train slice (exchange carries
    * one row per distinct unigram/bigram, not per token); the score
    * stream's positions take three equi-joins (bigram LM + two unigram
    * probes — Zipf-skewed keys, AQE broadcasts when the LM fits and
    * skew-splits when it doesn't); N+V rides a 1-row broadcast; one
    * per-doc sum. No window, no cartesian, nothing quadratic — LM size
    * tracks vocabulary, not corpus text.
    * Output: id, n_bigrams, lm_micro. */
  def bigramLmScore(train: DataFrame, score: DataFrame, id: String,
                    text: String): DataFrame = {
    val toksArr = split(trim(col(text)), "\\s+")
    val uni = train.select(explode(toksArr).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val nv = uni.agg(sum(col("cu")).as("_n"), count(lit(1)).as("_v"))
    def bigrams(df: DataFrame, extra: Seq[Column]): DataFrame = df
      .select(extra ++ Seq(
        slice(toksArr, lit(1), size(toksArr) - 1).as("l"),
        slice(toksArr, lit(2), size(toksArr) - 1).as("r")): _*)
      .select(extra :+ explode(arrays_zip(col("l"), col("r"))).as("z"): _*)
      .select(extra ++ Seq(col("z.l").as("w1"), col("z.r").as("w2")): _*)
    val bc = bigrams(train, Nil)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val term = bigrams(score, Seq(col(id)))
      .join(bc, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("p",
        when(col("cb").isNotNull, col("cb") / col("cu1"))
          .otherwise(lit(0.4) * (coalesce(col("cu2"), lit(0L)) + lit(1L))
            / (col("_n") + col("_v")).cast("double")))
      .select(col(id), round(log(col("p")) * lit(1000000)).cast("long").as("m"))
    score.select(col(id))
      .join(term.groupBy(col(id))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("m")).as("lm_micro")),
        Seq(id), "left")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_micro"), lit(0L)).as("lm_micro"))
      // vacuously true, but it bears on cardinality: under a bare
      // count() action the unique-key left join would otherwise prune
      // the whole LM pipeline (the d12 count-elimination lesson)
      .filter(col("n_bigrams") >= 0)
  }

  /** Per-document word n-gram repetition (Gopher-style repetitiousness
    * signal): rep_bp = floor((1 - distinct/total) * 10⁴) over the doc's
    * word n-grams WITH multiplicity. Shape: a ZERO-SHUFFLE scan
    * projection — the grams stay an in-row array and distinct-counting is
    * `array_distinct` per document (bounded by document size), instead of
    * exploding ~400 grams/doc into a corpus-wide two-level aggregation
    * (measured 4.0s -> 0.2s at sf0.1, and no exchange to grow with the
    * corpus). A 1-word document yields one 1-token "gram" (mirroring the
    * shingle floor in TextDedup.shingles).
    * Output: id, n_grams, n_distinct, rep_bp. */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, id: String,
                      text: String, n: Int = 2): org.apache.spark.sql.DataFrame = {
    val toks = split(trim(col(text)), "\\s+")
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    docs
      .select(col(id), size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      .select(col(id), col("n_grams"), col("n_distinct"),
        floor((lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"))
          * 10000).as("rep_bp"))
  }

  /** Sliding-window document CHUNKING — the embedding/RAG prep step:
    * each document becomes ⌈tokens/stride⌉ chunks of up to `chunkSize`
    * whitespace tokens, consecutive chunks overlapping by `overlap`
    * tokens (stride = chunkSize − overlap), so no boundary sentence is
    * lost to a hard cut. Emits `(id, chunk_idx, n_tokens, chunk_md5)` —
    * the md5 is a portable content address for the chunk text (join key
    * for embedding caches; any engine recomputes it identically).
    *
    * Pure per-row projection + explode: zero shuffles, no window — chunk
    * boundaries depend only on the row itself, so the operator scales
    * with a plain map at any corpus size. */
  def chunkDocs(docs: org.apache.spark.sql.DataFrame, id: String, text: String,
                chunkSize: Int = 64, overlap: Int = 16): org.apache.spark.sql.DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"chunkSize ($chunkSize) must exceed overlap ($overlap)")
    val stride = chunkSize - overlap
    val toks = split(trim(col(text)), "\\s+")
    val n = size(toks)
    // last chunk start = largest i*stride < n  →  i ≤ (n-1)/stride
    val nChunks = floor((n - lit(1)).cast("double") / lit(stride)).cast("int") + lit(1)
    val chunks = transform(sequence(lit(0), nChunks - lit(1)), i => {
      val start = i * lit(stride)
      struct(
        i.cast("long").as("chunk_idx"),
        least(lit(chunkSize), n - start).cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice(toks, start + lit(1), lit(chunkSize))).cast("binary"))
          .as("chunk_md5"))
    })
    docs.select(col(id), explode(chunks).as("ch"))
      .select(col(id), col("ch.chunk_idx").as("chunk_idx"),
        col("ch.n_tokens").as("n_tokens"), col("ch.chunk_md5").as("chunk_md5"))
  }

  /** BM25 retrieval scoring of a FIXED query-term set against the corpus —
    * the lexical-retrieval primitive (RAG candidate generation, targeted
    * decontamination probes). Okapi BM25 with Lucene's always-positive idf
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`; scores rounded to 6dp BEFORE
    * ranking (cross-engine ulp discipline), top `k` docs returned with a
    * dense rank, ties broken by id.
    *
    * Shape at scale: corpus stats (N, avgdl) come from ONE scan-stage
    * global aggregate (no shuffle, partial-combined; a driver scalar like
    * t12's count). The token stream is filtered to the |Q| query terms
    * BEFORE the tf shuffle — the scan stage discards every non-query
    * token, so the (doc,term) aggregate shuffles |Q|-bounded rows, not the
    * vocabulary. Per-term df is derived from that tf frame and broadcast
    * back (|Q| rows). Doc length joins from a groupBy(id) aggregate keyed
    * on the SAME id as the score sum. Final global top-k is orderBy+limit
    * (TakeOrdered heaps, never a single-partition total sort). Contrast
    * t12: full-vocabulary TF-IDF deliberately shuffles the whole vocab;
    * BM25 against a fixed query never has to. */
  def bm25TopK(docs: DataFrame, id: String, text: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "need query terms and k > 0")
    val toksCol = split(trim(col(text)), "\\s+")
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(size(toksCol).cast("double")).as("avgdl")).head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val toks = docs.select(col(id), explode(toksCol).as("term"))
    val dl = toks.groupBy(col(id)).agg(count(lit(1)).cast("double").as("dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = tf.join(broadcast(dfq), Seq("term"))
      .join(dl, Seq(id))
      .groupBy(col(id)).agg(round(sum(contrib), 6).as("bm25"))
    val topK = scored.orderBy(col("bm25").desc, col(id)).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col(id))
    topK.withColumn("rank", row_number().over(w).cast("long"))
      .select(col(id), col("bm25"), col("rank"))
  }

  /** Markup stripping — the boilerplate-removal step of a web-corpus
    * pipeline: drop `<...>` tags, collapse the whitespace they leave, trim.
    * Regex-tier by design (a real extractor also scores link density and
    * drops nav/footer blocks — that composes on top via [[qualityScore]]);
    * pure codegen'd projection, zero shuffles at any scale. */
  def stripHtml(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  /** Tag count over raw markup — the link/markup-density signal side of
    * [[stripHtml]] (a page that is mostly tags is boilerplate). */
  def htmlTagCount(c: Column): Column =
    size(regexp_extract_all(c, lit("<[^>]*>"), lit(0))).cast("long")

  /** Jensen–Shannon divergence between the unigram distributions of two
    * corpus slices — the token-level drift measure that says whether two
    * sources/batches speak the same language mixture (0 = identical,
    * ln 2 ≈ 0.693 = disjoint), symmetric and finite where raw KL blows up
    * on single-side terms.
    *
    * Shape at scale: one scan → token explode → ONE vocabulary-keyed
    * conditional aggregate holds both slices' counts (never two passes or
    * a self-join); totals are two driver scalars broadcast back; the final
    * reduction is a singleton aggregate. Determinism: each term's
    * contribution is rounded to integer MICRO-units before the sum, so
    * the cross-partition (and cross-engine) float summation order can
    * never move the answer — `js_micro` is an exact integer.
    */
  def unigramJsDivergence(docs: DataFrame, text: String,
                          sideA: Column): DataFrame = {
    val toks = docs.select(sideA.as("_a"),
      explode(split(trim(col(text)), "\\s+")).as("w"))
    val counts = toks.groupBy(col("w")).agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("a_n"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("b_n"))
    val tot = counts.agg(
      sum(col("a_n")).cast("double"), sum(col("b_n")).cast("double")).head()
    require(!tot.isNullAt(0) && tot.getDouble(0) > 0 && tot.getDouble(1) > 0,
      "unigramJsDivergence: both slices must contain tokens")
    val (at, bt) = (tot.getDouble(0), tot.getDouble(1))
    val p = col("a_n") / lit(at)
    val q = col("b_n") / lit(bt)
    val m = (p + q) / lit(2.0)
    val contrib =
      when(col("a_n") > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
      when(col("b_n") > 0, lit(0.5) * q * log(q / m)).otherwise(lit(0.0))
    counts.agg(
      count(lit(1)).as("n_terms"),
      sum(col("a_n")).as("a_tokens"),
      sum(col("b_n")).as("b_tokens"),
      sum(round(contrib * lit(1000000.0)).cast("long")).as("js_micro"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — merge per-retriever
    * top-k rankings (lexical BM25, embedding ANN, …) into one list by
    * `Σ 1/(c + rank)`, the standard hybrid-retrieval combiner: rank-based,
    * so BM25 scores and cosine scores never need calibrating against each
    * other.
    *
    * Input frames are already tiny (top-k each), so the fusion is a
    * union+groupBy over ≤ Σkᵢ rows — ONE shuffle of k-bounded data, never
    * touching the corpora; the final global order is a k-bounded sort.
    * An id absent from one ranking contributes nothing for that retriever
    * (its per-side rank comes back null). `rrf` is rounded 6dp BEFORE the
    * final rank so cross-engine ulp becomes exact ties broken by id.
    *
    * @param rankings (label, frame) pairs; each frame carries `idCol` and
    *                 `rankCol` (1-based). Labels become `<label>_rank`
    *                 output columns and must be distinct.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.size >= 2, "rrfFuse: need at least two rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "rrfFuse: ranking labels must be distinct")
    require(k > 0 && c > 0, "rrfFuse: k and c must be positive")
    val tagged = rankings.map { case (nm, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as("_r"),
        lit(nm).as("_side"))
    }.reduce(_ unionByName _)
    val sideRank = rankings.map { case (nm, _) =>
      max(when(col("_side") === nm, col("_r"))).as(s"${nm}_rank") }
    val fused = tagged.groupBy(col(idCol))
      .agg(sideRank.head, sideRank.tail: _*)
    val rrf = rankings.map { case (nm, _) =>
      coalesce(lit(1.0) / (lit(c.toDouble) + col(s"${nm}_rank")), lit(0.0)) }
      .reduce(_ + _)
    val scored = fused.withColumn("rrf", round(rrf, 6))
    val topK = scored.orderBy(col("rrf").desc, col(idCol)).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf").desc, col(idCol))
    topK.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** BPE merge-list LEARNING (Sennrich et al. 2016): `nMerges`
    * iterations of most-frequent-adjacent-pair selection over the
    * current tokenization, driver-iterated like the k-means fit (each
    * iteration = one distributed pair-count aggregate + a 1-row argmax
    * collect; ties break lexically so the list is deterministic under
    * any partitioning). Stops early when no adjacent pair occurs twice.
    *
    * Pair counting never crosses a whitespace boundary: words explode
    * first, the current merge list re-tokenizes each word
    * ([[graft.functions.TextExpressions.BpeTokenize]] — the same kernel
    * that later APPLIES the list), and `zip_with` pairs each token with
    * its right neighbour.
    *
    * Train on a bounded content-addressed sample, apply to the corpus —
    * the production shape (every real tokenizer trains on a sample;
    * N full-corpus scans for N merges would be the wrong plan at
    * 100 TB, and a sample's pair statistics converge long before the
    * corpus'). */
  /** [[bpeLearn]]'s driver-local twin for the USUAL case — a
    * tokenizer-training sample small enough to hold (10²–10⁵ docs): the
    * same algorithm, same tie-break (count desc, then UTF-8-byte order
    * of left, right — matching Spark's binary string ordering), zero
    * Spark jobs. Training is inherently iterative and latency-bound;
    * spending a distributed job per merge on a 256-doc sample is plan
    * overhead, not parallelism (measured: 24 merges = ~3 s of job
    * scheduling vs ~10 ms local). Reach for [[bpeLearn]] only when the
    * training sample itself is too big to collect. Pinned equal to the
    * distributed fit by spec. */
  def bpeLearnLocal(texts: Seq[String], nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    // pre-tokenize: distinct word -> (symbols, count)
    val words = mutable.LinkedHashMap.empty[String, Long]
    texts.foreach { t =>
      if (t != null) t.trim.split("\\s+").foreach { w =>
        if (w.nonEmpty) words.update(w, words.getOrElse(w, 0L) + 1L)
      }
    }
    var state: Vector[(Vector[String], Long)] = words.toVector.map { case (w, c) =>
      val syms = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      (syms.result(), c)
    }
    def byUtf8(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val merges = Vector.newBuilder[(String, String)]
    var n = 0
    var exhausted = false
    while (n < nMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (bl, br) = counts.keysIterator.reduce { (x, y) =>
          val cx = counts(x); val cy = counts(y)
          if (cx != cy) { if (cx > cy) x else y }
          else {
            val l = byUtf8(x._1, y._1)
            if (l != 0) { if (l < 0) x else y }
            else if (byUtf8(x._2, y._2) < 0) x else y
          }
        }
        if (counts((bl, br)) < 2) exhausted = true
        else {
          merges += ((bl, br))
          n += 1
          state = state.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val next = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == bl && syms(i + 1) == br) {
                  next += bl + br; i += 2
                } else { next += syms(i); i += 1 }
              }
              (next.result(), c)
            }
          }
        }
      }
    }
    merges.result()
  }

  /** Distributed BPE fit with BATCHED merge selection AND INCREMENTAL
    * pair-count maintenance — the standard fast-BPE bookkeeping
    * (Sennrich's learn_bpe cache, the HuggingFace trainer's update
    * rule) re-expressed for a word state too big to collect. Two
    * pieces of state live across rounds:
    *
    *  - the DISTRIBUTED word state: one `(symbols, count)` row per
    *    DISTINCT word (one grouping shuffle at entry, then the corpus
    *    is never rescanned), cached `MEMORY_AND_DISK`;
    *  - the DRIVER pair-count map: exact counts of every adjacent
    *    symbol pair in the current tokenization. Bounded by the number
    *    of distinct adjacent pairs — the same envelope every in-memory
    *    BPE trainer holds (and far smaller than the word state, which
    *    is what actually grows with the sample); the k-means-codebook
    *    class of driver state, not a corpus collect.
    *
    * Per round, merge selection is a pure driver-side scan of the map
    * (zero jobs), and applying the batch costs ONE small Spark job
    * that rewrites only matching words in a single left-to-right pass
    * and aggregates the resulting pair-count DELTAS (changed words
    * emit `new-pairs − old-pairs`, weighted by word count; unchanged
    * words emit nothing). The map absorbs the deltas and the next
    * round selects from exact counts. Nothing re-tokenizes from
    * scratch, so per-round cost is flat in the merge number — the fix
    * for the measured one-job-per-merge collapse of the round-12
    * recount design (BASELINE.md BPE table: 949 jobs / 480 s for a
    * tie-heavy 1k-merge strict fit; this design re-measured there).
    * Lineage is cut by `localCheckpoint` every 50 rounds so a 32k-vocab
    * fit neither deepens task binaries nor risks recompute cascades.
    *
    * Batch selection is unchanged from the provable round-12 rule:
    * scan candidates in sequential order (count desc, UTF-8 l, r —
    * `candPool` bounds the scan), accept while SYMBOL-DISJOINT from
    * everything accepted this round (left, right, AND the concatenated
    * new symbol), STOP at the first candidate that shares, then
    * truncate to selections whose count strictly exceeds the first
    * non-accepted candidate's (a created pair can tie — never beat —
    * that bound; if nothing survives, fall back to the single top
    * pair, the sequential argmax by construction). Within a batch the
    * disjointness makes one simultaneous left-to-right pass equal to
    * merge-at-a-time application: no accepted pair's side equals
    * another's side or created symbol, so matches can neither overlap
    * nor create/destroy each other's occurrences. Spec-pinned equal to
    * [[bpeLearnLocal]] across batch/pool settings (TextAnalysisSpec).
    *
    * `strictOrder = false` is the industry-standard relaxation:
    * sharing candidates are SKIPPED instead of stopping the batch, so
    * every round fills toward `batchN`. Disclosed trade (unchanged):
    * post-skip selections in a round use that round's opening counts,
    * so the learned list can genuinely differ from sequential — a
    * different-but-valid BPE vocabulary. Strict stays the default; its
    * batches are still small on share-heavy text, but a small batch
    * now costs one cheap delta job, not a corpus recount, so the
    * reproducible fit is no longer throughput-gated. */
  def bpeLearn(docs: DataFrame, text: String, nMerges: Int,
               batchN: Int = 64, candPool: Int = 1024,
               strictOrder: Boolean = true): Seq[(String, String)] = {
    require(batchN >= 1 && candPool >= 1)
    import scala.collection.mutable
    val sp = docs.sparkSession
    import sp.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var state: org.apache.spark.rdd.RDD[(Array[String], Long)] = docs
      .select(explode(split(trim(col(text)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].rdd
      .map { case (w, c) => (codepointSymbols(w), c) }
      .persist(lvl)
    var pinned: org.apache.spark.rdd.RDD[_] = state
    // the most recent localCheckpoint-ed generation: checkpointing
    // TRUNCATES lineage, so its blocks are the recovery root for every
    // later chained RDD — keep it persisted until the NEXT checkpoint
    // materializes, or a post-checkpoint cache loss is unrecoverable
    var lastCkpt: org.apache.spark.rdd.RDD[_] = null
    try {
      // exact pair counts of the CURRENT tokenization, maintained by
      // per-round deltas after this one seeding aggregate
      val counts = mutable.HashMap.empty[(String, String), Long]
      state.flatMap { case (syms, c) =>
        (0 until syms.length - 1).iterator.map(i => ((syms(i), syms(i + 1)), c))
      }.reduceByKey(_ + _).collect().foreach { case (k, c) => counts(k) = c }
      // sequential candidate order: count desc, then UTF-8 byte order of
      // l then r — the exact ordering Spark's string sort gave the old
      // recount plan and the local twin's reduce uses.
      val ord = new Ordering[(String, String, Long)] {
        def compare(x: (String, String, Long), y: (String, String, Long)): Int = {
          if (x._3 != y._3) java.lang.Long.compare(y._3, x._3)
          else {
            val l = byUtf8(x._1, y._1)
            if (l != 0) l else byUtf8(x._2, y._2)
          }
        }
      }
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      var round = 0
      while (merges.length < nMerges && !exhausted) {
        // top-candPool by `ord` via a bounded heap: O(pairs · log pool)
        // driver work per round, no job
        val heap = mutable.PriorityQueue.empty[(String, String, Long)](ord)
        counts.foreach { case ((l, r), c) =>
          val t = (l, r, c)
          if (heap.size < candPool) heap.enqueue(t)
          else if (ord.lt(t, heap.head)) { heap.dequeue(); heap.enqueue(t) }
        }
        val cands = heap.dequeueAll.toArray.reverse
        val batch = Vector.newBuilder[(String, String, Long)]
        val touched = mutable.HashSet.empty[String]
        var taken = 0
        var stop = false
        var idx = 0
        val room = nMerges - merges.length
        while (!stop && idx < cands.length && taken < math.min(batchN, room)) {
          val (l, r, c) = cands(idx)
          if (c < 2) stop = true
          else if (touched(l) || touched(r) || touched(l + r)) {
            if (strictOrder) stop = true else idx += 1 // skip-mode: pass over
          } else {
            batch += ((l, r, c)); taken += 1
            touched += l; touched += r; touched += (l + r)
            idx += 1
          }
          // on strict stop, idx stays at the first non-accepted candidate
        }
        // cBound = the first non-accepted candidate's count (every pair a
        // selection can perturb orders at or after it); 1 when the pool
        // was consumed completely AND covered every pair. Only the strict
        // mode truncates (skip-mode trades the guarantee for batch fill).
        val cBound: Long =
          if (!strictOrder) -1L
          else if (idx < cands.length) cands(idx)._3
          else if (cands.length == candPool) cands.last._3
          else 1L
        val accepted = batch.result()
        val kept = accepted.filter(_._3 > cBound)
        val picked: Vector[(String, String)] =
          if (kept.nonEmpty) kept.map(t => (t._1, t._2))
          else if (accepted.nonEmpty) Vector((accepted.head._1, accepted.head._2))
          else Vector.empty
        if (picked.isEmpty) exhausted = true
        else {
          merges = merges ++ picked
          val bm = picked.iterator.map { case (l, r) => ((l, r), l + r) }.toMap
          val applied = state
            .map { case (syms, c) => applyMergeBatch(syms, c, bm) }
            .persist(lvl)
          val didCkpt = round % 50 == 49
          if (didCkpt) applied.localCheckpoint()
          val deltas = applied.flatMap(_._3.iterator).reduceByKey(_ + _).collect()
          deltas.foreach { case (k, d) =>
            val nv = counts.getOrElse(k, 0L) + d
            if (nv > 0L) counts(k) = nv else counts.remove(k)
          }
          // never drop the checkpoint root while later rounds chain off it
          if (pinned ne lastCkpt) pinned.unpersist(blocking = false)
          if (didCkpt) {
            // the new checkpoint is materialized (the collect above ran
            // it) — the previous root is no longer anyone's recovery path
            if (lastCkpt ne null) lastCkpt.unpersist(blocking = false)
            lastCkpt = applied
          }
          pinned = applied
          state = applied.map(t => (t._1, t._2))
          round += 1
        }
      }
      merges
    } finally {
      pinned.unpersist(blocking = false)
      if ((lastCkpt ne null) && (lastCkpt ne pinned))
        lastCkpt.unpersist(blocking = false)
      ()
    }
  }

  /** Every substring of `w` spanning 1..`maxLen` CODE POINTS, weighted
    * by the word's count — the unigram seed-count unit, shared by the
    * driver loop and the distributed flatMap. */
  private def seedSubstrings(
      w: String, c: Long, maxLen: Int): Iterator[(String, Long)] = {
    val syms = codepointSymbols(w)
    (0 until syms.length).iterator.flatMap { i =>
      val lim = math.min(syms.length - i, maxLen)
      (1 to lim).iterator.map(l => (syms.slice(i, i + l).mkString, c))
    }
  }

  /** A word as code-point symbols — the BPE base alphabet (same split
    * as [[bpeLearnLocal]]'s). */
  private def codepointSymbols(w: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      b += w.substring(i, i + n)
      i += n
    }
    b.result()
  }

  private def byUtf8(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** One simultaneous greedy left-to-right pass of a SYMBOL-DISJOINT
    * merge batch over one word, returning the rewritten symbols plus
    * the pair-count deltas the rewrite causes (`new − old`, weighted by
    * the word's count; empty when nothing matched — the common case,
    * which is what keeps the per-round delta shuffle tiny). Disjointness
    * (no accepted pair's side equals another's side or concatenated new
    * symbol) is what makes the single pass equal to applying the
    * batch's merges one at a time in order — see [[bpeLearn]]. */
  private def applyMergeBatch(syms: Array[String], cnt: Long,
      merged: Map[(String, String), String])
      : (Array[String], Long, Array[((String, String), Long)]) = {
    if (syms.length < 2) (syms, cnt, Array.empty)
    else {
      val next = Array.newBuilder[String]
      var i = 0
      var changed = false
      while (i < syms.length) {
        if (i < syms.length - 1 && merged.contains((syms(i), syms(i + 1)))) {
          next += merged((syms(i), syms(i + 1)))
          i += 2
          changed = true
        } else { next += syms(i); i += 1 }
      }
      if (!changed) (syms, cnt, Array.empty)
      else {
        val ns = next.result()
        val d = scala.collection.mutable.HashMap.empty[(String, String), Long]
        var j = 0
        while (j < ns.length - 1) {
          val k = (ns(j), ns(j + 1)); d(k) = d.getOrElse(k, 0L) + cnt; j += 1
        }
        j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1)); d(k) = d.getOrElse(k, 0L) - cnt; j += 1
        }
        (ns, cnt, d.iterator.filter(_._2 != 0L).toArray)
      }
    }
  }

  /** Unigram-LM (SentencePiece) tokenizer FIT — the model behind most
    * deployed open-weight tokenizers (T5/LLaMA-family), beside [[bpeLearnLocal]]'s
    * BPE: a vocabulary of subword PIECES with log-probabilities, applied
    * by per-word Viterbi segmentation (Kudo 2018). This fit is the
    * deterministic HARD-EM (Viterbi-EM) variant over the bounded
    * content-addressed sample (t23's train-on-a-sample discipline):
    *
    *  1. SEED: every single code point (never pruned — guarantees any
    *     word segments) + the `seedCap` most frequent multi-codepoint
    *     substrings up to `seedMaxLen` code points (count desc, UTF-8
    *     order tiebreak), scored by raw occurrence frequency;
    *  2. E-STEP: segment every distinct word with the SAME integer
    *     Viterbi the apply kernel uses
    *     ([[graft.functions.TextExpressions.viterbiSegment]] — fit and
    *     inference cannot disagree by construction) and accumulate
    *     count-weighted piece usage;
    *  3. M-STEP: score(p) = round(ln(c'(p)/Σc')·1e6) in integer
    *     MICRO-NATS, where c' adds +1 smoothing to single code points
    *     (they must survive zero usage) and drops unused multi pieces;
    *  4. PRUNE: while the multi-piece vocabulary exceeds `vocabSize`,
    *     keep the top pieces by expected count (UTF-8 tiebreak),
    *     dropping `pruneFrac` of the excess per round, then re-run EM —
    *     SentencePiece's prune-and-refit loop with the likelihood-loss
    *     ranking simplified to usage ranking (the hard-EM analogue).
    *
    * All state is integer or count-ordered — the fit is bit-identical
    * across runs and JVMs. Returns (piece, micro-nat log-prob) sorted
    * by UTF-8 piece order; feed to
    * [[graft.functions.TextExpressions.unigramTokenize]]. */
  def unigramFitLocal(texts: Seq[String], vocabSize: Int,
                      seedMaxLen: Int = 6, seedCap: Int = 2048,
                      emRounds: Int = 2,
                      pruneFrac: Double = 0.5): Seq[(String, Long)] = {
    import scala.collection.mutable
    val words = mutable.LinkedHashMap.empty[String, Long]
    texts.foreach { t =>
      if (t != null) t.trim.split("\\s+").foreach { w =>
        if (w.nonEmpty) words.update(w, words.getOrElse(w, 0L) + 1L)
      }
    }
    unigramFitWords(
      Left(words.toVector), vocabSize, seedMaxLen, seedCap, emRounds, pruneFrac)
  }

  /** [[unigramFitLocal]]'s DISTRIBUTED twin — for a training sample too
    * big to collect (the [[bpeLearn]] relationship). The distinct-word
    * state is STATIC here (unigram EM never rewrites words — unlike
    * BPE's merge application), so the fit is: one grouping shuffle at
    * entry, one seed-count aggregate, then per EM round exactly ONE job
    * (segment every cached word under the broadcast score table,
    * reduceByKey the piece counts — the shuffle carries the vocabulary,
    * never the corpus) with all selection/pruning driver-side on the
    * vocab-sized count map. Spec-pinned bit-identical to the local fit:
    * both run [[unigramFitWords]], whose E-step sums per-piece LONG
    * counts (addition commutes — partitioning cannot move the result). */
  def unigramFit(docs: DataFrame, text: String, vocabSize: Int,
                 seedMaxLen: Int = 6, seedCap: Int = 2048,
                 emRounds: Int = 2,
                 pruneFrac: Double = 0.5): Seq[(String, Long)] = {
    val sp = docs.sparkSession
    import sp.implicits._
    val words = docs
      .select(explode(split(trim(col(text)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try unigramFitWords(
      Right(words), vocabSize, seedMaxLen, seedCap, emRounds, pruneFrac)
    finally { words.unpersist(blocking = false); () }
  }

  /** Shared hard-EM loop over distinct words with counts — Left: a
    * driver vector ([[unigramFitLocal]]); Right: a cached RDD
    * ([[unigramFit]]). Every step except the E-step scan is driver-side
    * either way, and the E-step is a commutative LONG-count sum, so the
    * two forms are bit-identical by construction. */
  private def unigramFitWords(
      words: Either[Vector[(String, Long)],
                    org.apache.spark.rdd.RDD[(String, Long)]],
      vocabSize: Int, seedMaxLen: Int, seedCap: Int,
      emRounds: Int, pruneFrac: Double): Seq[(String, Long)] = {
    import scala.collection.mutable
    require(vocabSize >= 0 && seedMaxLen >= 2 && seedCap >= 0)
    require(emRounds >= 1 && pruneFrac > 0.0 && pruneFrac <= 1.0)
    if (words.fold(_.isEmpty, _.isEmpty())) return Seq.empty
    // seed counts: all substrings of 1..seedMaxLen code points — a
    // driver loop or ONE flatMap+reduceByKey job; the distinct-substring
    // domain is trainer-state-sized either way (bpeLearn's driver-map
    // class)
    val subCounts = mutable.HashMap.empty[String, Long]
    words match {
      case Left(v) => v.foreach { case (w, c) =>
        seedSubstrings(w, c, seedMaxLen).foreach { case (p, n) =>
          subCounts.update(p, subCounts.getOrElse(p, 0L) + n)
        }
      }
      case Right(rdd) =>
        val ml = seedMaxLen
        rdd.flatMap { case (w, c) => seedSubstrings(w, c, ml) }
          .reduceByKey(_ + _).collect()
          .foreach { case (p, n) => subCounts(p) = n }
    }
    def cpLen(p: String): Int = p.codePointCount(0, p.length)
    val singles = subCounts.keysIterator.filter(cpLen(_) == 1).toVector
    val multiSeed = subCounts.iterator.filter { case (p, _) => cpLen(p) > 1 }
      .toArray.sortWith { (x, y) =>
        if (x._2 != y._2) x._2 > y._2 else byUtf8(x._1, y._1) < 0
      }.take(seedCap).map(_._1)
    def scoresFrom(counts: collection.Map[String, Long]): mutable.HashMap[String, Long] = {
      val total = counts.valuesIterator.sum
      val m = mutable.HashMap.empty[String, Long]
      counts.foreach { case (p, c) =>
        // StrictMath: math.log may differ by an ulp across JVMs/arches,
        // and a 1-ulp flip at a micro-nat rounding boundary would break
        // the cross-machine bit-identical claim the doc makes
        m(p) = math.round(StrictMath.log(c.toDouble / total.toDouble) * 1e6)
      }
      m
    }
    // initial scores from raw substring frequency over the seed vocab
    var active: Vector[String] = singles ++ multiSeed
    var scores = scoresFrom(active.iterator.map(p => p -> subCounts(p)).toMap)
    def emCounts(): mutable.HashMap[String, Long] = {
      val maxCp = scores.keysIterator.map(cpLen).max
      val counts = mutable.HashMap.empty[String, Long]
      words match {
        case Left(v) =>
          val table = new java.util.HashMap[String, java.lang.Long](scores.size * 2)
          scores.foreach { case (p, s) => table.put(p, java.lang.Long.valueOf(s)) }
          v.foreach { case (w, c) =>
            // oov is unreachable in the fit (every single code point is
            // in the seed and never pruned) — the constant is a safe
            // sentinel, large-negative but overflow-free
            graft.functions.TextExpressions
              .viterbiSegment(w, table, maxCp, -1000000000L)
              .foreach(p => counts.update(p, counts.getOrElse(p, 0L) + c))
          }
        case Right(rdd) =>
          // ONE job per EM round: the score table ships in the closure
          // (vocab-sized), builds once per partition, and the shuffle
          // carries per-piece LONG counts — the vocabulary, never the
          // corpus. Long addition commutes, so this is bit-identical to
          // the driver loop above.
          val scoreArr = scores.toArray
          val mc = maxCp
          rdd.mapPartitions { it =>
            val table = new java.util.HashMap[String, java.lang.Long](scoreArr.length * 2)
            scoreArr.foreach { case (p, s) => table.put(p, java.lang.Long.valueOf(s)) }
            val acc = scala.collection.mutable.HashMap.empty[String, Long]
            it.foreach { case (w, c) =>
              graft.functions.TextExpressions
                .viterbiSegment(w, table, mc, -1000000000L)
                .foreach(p => acc.update(p, acc.getOrElse(p, 0L) + c))
            }
            acc.iterator
          }.reduceByKey(_ + _).collect()
            .foreach { case (p, n) => counts(p) = n }
      }
      counts
    }
    def mStep(used: mutable.HashMap[String, Long]): Unit = {
      val c = mutable.HashMap.empty[String, Long]
      singles.foreach(p => c(p) = used.getOrElse(p, 0L) + 1L) // smoothing
      active.foreach { p =>
        if (cpLen(p) > 1) {
          val u = used.getOrElse(p, 0L)
          if (u > 0L) c(p) = u // unused multi pieces drop out
        }
      }
      active = active.filter(c.contains)
      scores = scoresFrom(c)
    }
    var done = false
    while (!done) {
      var r = 0
      var lastUse: mutable.HashMap[String, Long] = null
      while (r < emRounds) { lastUse = emCounts(); mStep(lastUse); r += 1 }
      val multi = active.filter(cpLen(_) > 1)
      if (multi.size > vocabSize) {
        val excess = multi.size - vocabSize
        val keepN = multi.size - math.max(1, math.ceil(excess * pruneFrac).toInt)
        val kept = multi.map(p => (p, lastUse.getOrElse(p, 0L)))
          .sortWith { (x, y) =>
            if (x._2 != y._2) x._2 > y._2 else byUtf8(x._1, y._1) < 0
          }.take(keepN).map(_._1).toSet
        active = active.filter(p => cpLen(p) == 1 || kept(p))
        scores = scores.filter { case (p, _) => cpLen(p) == 1 || kept(p) }
      } else done = true
    }
    scores.toSeq.sortWith((x, y) => byUtf8(x._1, y._1) < 0)
  }

  /** The Gopher REPETITION battery (Rae et al. 2021, Appendix A1.1) —
    * the within-document repetitiousness signals beyond [[repetitionStats]]'
    * distinct-gram ratio: duplicate-LINE fraction and character fraction,
    * the TOP n-gram's character share, and the duplicated-n-gram character
    * COVERAGE ("taking care not to count characters twice" — a positional
    * interval union, not an occurrence sum). The corpus's synthetic text
    * is newline-free, so "lines" are `lineWords`-word segments (the d17
    * segmentation convention); real newline text pre-splits trivially.
    *
    * Definitions (toks = whitespace tokens, W = |toks|,
    * normLen = |single-space-normalized text|, wordChars = Σ|tok| =
    * normLen − (W−1)):
    *  - `dup_line_bp`   = ⌊10⁴ · (#line occurrences whose content appears
    *    ≥2× in the doc) / n_lines⌋
    *  - `dup_line_char_bp` = ⌊10⁴ · (chars of those occurrences) / normLen⌋
    *  - `top_gram_bp`   = ⌊10⁴ · (count·|gram| of the most frequent
    *    `topN`-gram) / normLen⌋, capped at 10⁴ (overlapping occurrences can
    *    nominally exceed the doc); ties → lexicographically smallest gram
    *  - `dup_gram_bp`   = ⌊10⁴ · (word chars covered by ≥1 occurrence of
    *    any within-doc-duplicated `dupN`-gram) / wordChars⌋ — the union of
    *    intervals [p, p+n), each char counted once
    *
    * Shape at scale: a ZERO-SHUFFLE scan projection running the compiled
    * [[graft.functions.VectorExpressions.GopherRepetition]] kernel — one
    * split + hash-count + linear interval sweep per document, no
    * per-element lambda re-evaluation (the d11 lesson). The declarative
    * HOF twin below ([[gopherRepetitionHof]]) is spec-pinned equal. */
  def gopherRepetition(docs: DataFrame, id: String, text: String,
                       lineWords: Int = 10, topN: Int = 2,
                       dupN: Int = 5): DataFrame = {
    val g = graft.functions.VectorExpressions.gopherRepetition(
      col(text), lineWords, topN, dupN)
    docs.select(col(id), g.as("g"))
      .select(col(id), col("g.n_lines").as("n_lines"),
        col("g.dup_line_bp").as("dup_line_bp"),
        col("g.dup_line_char_bp").as("dup_line_char_bp"),
        col("g.top_gram_bp").as("top_gram_bp"),
        col("g.dup_gram_bp").as("dup_gram_bp"))
  }

  /** The declarative higher-order-function formulation of
    * [[gopherRepetition]] — array_sort + neighbor compare for duplicate
    * detection, a fold for the run-length max and the interval-union
    * sweep. Kept as the REFERENCE TWIN (the spec pins it equal to the
    * compiled kernel on every fixture): nominally O(W log W), but
    * Catalyst re-evaluates a lambda's captured arrays per element (the
    * d11 lesson), so on repetitive mega-docs the folds degrade toward
    * O(W²·log W) — ship the kernel, read this for the semantics. */
  def gopherRepetitionHof(docs: DataFrame, id: String, text: String,
                          lineWords: Int = 10, topN: Int = 2,
                          dupN: Int = 5): DataFrame = {
    val toks = split(trim(col(text)), "\\s+")
    val w = size(toks)
    val normLen = length(concat_ws(" ", toks))
    val wordChars = normLen - (w - lit(1))

    // ---- lines: lineWords-word segments; dup = content seen >=2x in-doc
    val nLines = floor((w - lit(1)).cast("double") / lit(lineWords))
      .cast("int") + lit(1)
    val lines = transform(sequence(lit(0), nLines - lit(1)),
      i => concat_ws(" ", slice(toks, i * lit(lineWords) + lit(1), lit(lineWords))))
    val sortedLines = array_sort(lines)
    // occurrence i (1-based into the sorted array) duplicates a neighbor
    def dupAt(arr: Column, i: Column, n: Column): Column =
      (i > 1 && element_at(arr, i) === element_at(arr, i - 1)) ||
        (i < n && element_at(arr, i) === element_at(arr, i + 1))
    val lineIdx = sequence(lit(1), nLines)
    val dupLineCnt = size(filter(lineIdx, i => dupAt(sortedLines, i, nLines)))
      .cast("long")
    val dupLineChars = aggregate(
      filter(lineIdx, i => dupAt(sortedLines, i, nLines)),
      lit(0L), (acc, i) => acc + length(element_at(sortedLines, i)).cast("long"))

    // ---- top topN-gram: run-length max over the sorted gram array
    val gTop = greatest(w - lit(topN - 1), lit(1))
    val gramsTop = array_sort(transform(sequence(lit(1), gTop),
      i => concat_ws(" ", slice(toks, i, lit(topN)))))
    val best = aggregate(
      sequence(lit(1), gTop),
      struct(lit(0L).as("bc"), lit(0L).as("bl"), lit(0L).as("cc")),
      (acc, i) => {
        val cur = when(i === 1 ||
            element_at(gramsTop, i) =!= element_at(gramsTop, i - 1), lit(1L))
          .otherwise(acc.getField("cc") + lit(1L))
        struct(
          when(cur > acc.getField("bc"), cur).otherwise(acc.getField("bc")).as("bc"),
          when(cur > acc.getField("bc"),
              length(element_at(gramsTop, i)).cast("long"))
            .otherwise(acc.getField("bl")).as("bl"),
          cur.as("cc"))
      })
    val topChars = best.getField("bc") * best.getField("bl")

    // ---- duplicated dupN-gram coverage: interval union over flagged starts
    val gDup = greatest(w - lit(dupN - 1), lit(1))
    val dupStructs = array_sort(transform(sequence(lit(1), gDup),
      i => struct(concat_ws(" ", slice(toks, i, lit(dupN))).as("g"), i.as("p"))))
    val sortedGrams = transform(dupStructs, s => s.getField("g"))
    val dupStarts = array_sort(transform(
      filter(sequence(lit(1), gDup), j => dupAt(sortedGrams, j, gDup)),
      j => element_at(dupStructs, j).getField("p")))
    // sweep ascending starts; e = first uncovered position (1-based)
    val cover = aggregate(
      dupStarts,
      struct(lit(1L).as("e"), lit(0L).as("c")),
      (acc, p) => {
        val from = greatest(acc.getField("e"), p.cast("long"))
        val to = p.cast("long") + lit(dupN.toLong) // exclusive
        val seg = slice(toks, from.cast("int"), greatest(to - from, lit(0L)).cast("int"))
        struct(
          greatest(acc.getField("e"), to).as("e"),
          (acc.getField("c") +
            aggregate(seg, lit(0L), (a, t) => a + length(t).cast("long"))).as("c"))
      })

    def bp(num: Column, den: Column): Column =
      floor(lit(10000.0) * num.cast("double") / den.cast("double")).cast("long")
    docs.select(col(id),
      nLines.cast("long").as("n_lines"),
      bp(dupLineCnt, nLines.cast("long")).as("dup_line_bp"),
      bp(dupLineChars, normLen.cast("long")).as("dup_line_char_bp"),
      least(bp(topChars, normLen.cast("long")), lit(10000L)).as("top_gram_bp"),
      bp(cover.getField("c"), wordChars.cast("long")).as("dup_gram_bp"))
  }

  /** The Gopher QUALITY battery (Rae et al. 2021, A1.1 — the companion
    * filter set to [[gopherRepetition]]'s repetition signals): document
    * statistics and the composed keep verdict over newline-delimited
    * text. Words = whitespace tokens of the WHOLE text (bullet glyphs
    * and symbol runs count as words — the paper's accounting); lines =
    * newline splits.
    *
    *  - `n_words`, `mean_wlen_c` = ⌊100·chars/words⌋ (codepoint chars)
    *  - `symbol_bp`  = ⌊10⁴·(# of '#' and '…' chars)/words⌋
    *  - `bullet_bp`  = ⌊10⁴·(lines starting "• "/"- ")/lines⌋
    *  - `ellipsis_bp`= ⌊10⁴·(lines ending "..."/"…")/lines⌋
    *  - `alpha_bp`   = ⌊10⁴·(words containing [a-zA-Z])/words⌋
    *  - `stop_hits`  = distinct hits among {the,be,to,of,and,that,have,with}
    *  - `keep`       = the paper's thresholds composed: 50 ≤ words ≤ 1e5,
    *    3 ≤ mean ≤ 10, symbol ≤ 0.1, bullets < 0.9, ellipses ≤ 0.3,
    *    alpha ≥ 0.8, stops ≥ 2
    *
    * One linear in-row pass (no sorts, no captured-array folds — unlike
    * the repetition battery this needs no compiled kernel), zero
    * shuffles. */
  def gopherQuality(docs: DataFrame, id: String, text: String): DataFrame = {
    val words = split(trim(col(text)), "\\s+")
    val w = size(words).cast("long")
    val wordChars = aggregate(words, lit(0L),
      (a, t) => a + length(t).cast("long"))
    val symbols = (length(col(text)) -
      length(replace(replace(col(text), lit("#"), lit("")),
        lit("…"), lit("")))).cast("long")
    val lines = split(col(text), "\n")
    val nLines = size(lines).cast("long")
    val bullets = size(filter(lines, l =>
      l.startsWith("• ") || l.startsWith("- "))).cast("long")
    val ellipses = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val alphaWords = size(filter(words, t => t.rlike("[a-zA-Z]"))).cast("long")
    val stops = size(array_intersect(words,
      array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
        .map(lit): _*))).cast("long")
    def bp(num: Column, den: Column): Column =
      floor(lit(10000.0) * num.cast("double") / den.cast("double")).cast("long")
    val meanC = floor(lit(100.0) * wordChars.cast("double") / w.cast("double"))
      .cast("long")
    val symbolBp = bp(symbols, w)
    val bulletBp = bp(bullets, nLines)
    val ellipsisBp = bp(ellipses, nLines)
    val alphaBp = bp(alphaWords, w)
    val keep = (w >= 50L && w <= 100000L &&
      meanC >= 300L && meanC <= 1000L &&
      symbolBp <= 1000L && bulletBp < 9000L && ellipsisBp <= 3000L &&
      alphaBp >= 8000L && stops >= 2L).cast("int").cast("long")
    docs.select(col(id), w.as("n_words"), meanC.as("mean_wlen_c"),
      symbolBp.as("symbol_bp"), bulletBp.as("bullet_bp"),
      ellipsisBp.as("ellipsis_bp"), alphaBp.as("alpha_bp"),
      stops.as("stop_hits"), keep.as("keep"))
  }

  /** The C4 heuristic CLEANUP (Raffel et al. 2020 §2.2) — the classic
    * line-and-page filter battery applied to newline-delimited text:
    *
    * LINE rules (a line is RETAINED iff all three hold):
    *  - ends in a terminal punctuation mark (`. ! ? "`);
    *  - has at least `minLineWords` whitespace words (C4 used 5);
    *  - does not contain "javascript" (case-insensitive — the cookie/JS
    *    warning heuristic).
    * PAGE rules (the document is KEPT iff all four hold):
    *  - at least `minKeptLines` retained lines (C4's 3-sentence floor);
    *  - no `{` anywhere (code);
    *  - no "lorem ipsum" (case-insensitive);
    *  - no token from `badWords` (lowercased token-exact match).
    *
    * Output: `(id, n_lines, n_kept_lines, doc_kept, clean_md5)` where
    * `clean_md5` content-addresses the retained lines rejoined with \n
    * (md5("") when nothing survives) — the oracle pins the cleaned text
    * byte-for-byte, not just the counts. Like every quality signal here:
    * a zero-shuffle in-row projection, one pass over the scan. */
  def c4Filter(docs: DataFrame, id: String, text: String,
               minLineWords: Int = 5, minKeptLines: Int = 3,
               badWords: Seq[String] = Seq.empty): DataFrame = {
    val lines = split(col(text), "\n")
    def keeps(l: Column): Column =
      l.rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = filter(lines, keeps _)
    val docTokens = split(lower(col(text)), "[^a-z0-9]+")
    val hasBad =
      if (badWords.isEmpty) lit(false)
      else size(array_intersect(docTokens,
        array(badWords.map(w => lit(w.toLowerCase)): _*))) > 0
    val docKept = (size(kept) >= minKeptLines) &&
      !col(text).contains("{") &&
      !lower(col(text)).contains("lorem ipsum") && !hasBad
    docs.select(col(id),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      docKept.cast("int").cast("long").as("doc_kept"),
      md5(concat_ws("\n", kept).cast("binary")).as("clean_md5"))
  }
}
