package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels Spark lacks as built-ins.
  *
  * Unicode normalization is a standard corpus-curation step (the same
  * visible string can be composed ("é") or decomposed ("e"+combining
  * accent); unnormalized corpora split token statistics and defeat exact
  * dedup). Spark has no normalization function; `java.text.Normalizer` is
  * the platform implementation, wrapped as a Catalyst expression so it
  * runs inside the scan projection — no UDF serialization, null-safe,
  * codegen'd via the reference-object pattern (see
  * [[VectorExpressions.HyperplaneBucket]]'s note).
  */
object TextExpressions {

  /** `nfc_normalize(string)`: Unicode NFC (canonical composition) — the
    * same semantics as DuckDB's `nfc_normalize`, which is what the oracle
    * uses to verify it. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "nfc_normalize"

    protected override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // fast path: Normalizer.isNormalized is a cheap scan, and real
      // corpora are overwhelmingly already-NFC — skip the rebuild
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
        input
      else
        UTF8String.fromString(
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nfcExpr", this, classOf[NfcNormalize].getName)
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $self.nullSafeEval($s);")
    }
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  def nfcNormalize(c: Column): Column = Shim.column(NfcNormalize(Shim.expression(c)))

  /** `char_entropy(string)`: per-CODEPOINT Shannon entropy in nats,
    * rounded to 6dp — the gibberish/encoding-noise quality signal as a
    * SCALAR kernel. Entropy of one document depends on nothing but that
    * document, so it belongs in the scan projection: O(len) per row with
    * a small local count table, zero shuffles — where the
    * explode → (id,char) aggregate formulation (the HOF-style reference
    * [[graft.ext.TextAnalysis.charEntropy]] is pinned against) shuffles
    * two aggregates just to count inside a row. NULL in → NULL out;
    * empty string → NULL (no distribution to measure — mirrors the
    * aggregate form, where an empty doc produces no rows). */
  case class CharEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "char_entropy"

    protected override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (s.isEmpty) null
      else {
        val counts = new java.util.HashMap[Integer, Long]()
        var i = 0
        var n = 0L
        while (i < s.length) {
          val cp = s.codePointAt(i)
          counts.merge(cp, 1L, (a, b) => a + b)
          n += 1
          i += Character.charCount(cp)
        }
        var clc = 0.0
        val it = counts.values().iterator()
        while (it.hasNext) { val c = it.next().toDouble; clc += c * math.log(c) }
        val h = math.log(n.toDouble) - clc / n
        // same HALF_UP discipline as Spark's round(col, 6), so the kernel
        // is bit-equal to the aggregate reference formulation
        java.math.BigDecimal.valueOf(h)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("entropyExpr", this, classOf[CharEntropy].getName)
      nullSafeCodeGen(ctx, ev, s => s"""
        Object r = $self.nullSafeEval($s);
        if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
      """)
    }
    override protected def withNewChildInternal(c: Expression): CharEntropy =
      copy(child = c)
  }

  def charEntropy(c: Column): Column = Shim.column(CharEntropy(Shim.expression(c)))

  /** `vocab_score_bp(string)`: one-pass linear text classification — the
    * fastText/DCLM-style quality-model scoring step, with the trained
    * model reduced to a token → integer-basis-point weight table carried
    * as a reference object. Tokenizes on whitespace (lowercased, trimmed
    * — the corpus-wide convention the oracles share), sums the weights of
    * in-vocabulary tokens, and returns `struct(n_toks, w_sum)` so the
    * caller derives the mean-pooled logit. INTEGER bp weights keep the
    * sum order-free and exact — a float Σ would hash-diverge from the
    * oracle's arbitrary join order.
    *
    * Scale: a real classifier vocab (10⁵–10⁶ tokens) is a few MB as a
    * hash map — it rides the plan to every executor, and scoring stays a
    * zero-shuffle scan projection, where the explode → broadcast-join →
    * re-group formulation shuffles the whole corpus once per scoring
    * pass just to reassemble documents. */
  case class VocabScoreBp(child: Expression, vocab: Map[String, Long])
      extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_toks",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("w_sum",
        org.apache.spark.sql.types.LongType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "vocab_score_bp"

    // java.util.HashMap probe with no boxing surprises on the hot path;
    // built once per executor on first deserialization
    @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
      m
    }

    protected override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.trim
        .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
      var sum = 0L
      var i = 0
      while (i < toks.length) {
        val w = table.get(toks(i))
        if (w ne null) sum += w.longValue()
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](toks.length.toLong, sum))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("vocabExpr", this, classOf[VocabScoreBp].getName)
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.nullSafeEval($s);")
    }
    override protected def withNewChildInternal(c: Expression): VocabScoreBp =
      copy(child = c)
  }

  def vocabScoreBp(c: Column, vocab: Map[String, Long]): Column =
    Shim.column(VocabScoreBp(Shim.expression(c), vocab))

  /** `bpe_tokenize(string)`: byte-pair-encoding APPLY — the real
    * subword-tokenization step (Sennrich et al. 2016 merge-list form,
    * the GPT-2/tiktoken family's algorithm shape) with the learned merge
    * list carried as a reference object, exactly like [[VocabScoreBp]]'s
    * weight table. Per whitespace word (pre-tokenization boundary —
    * merges NEVER cross whitespace): the word starts as its code-point
    * symbols, then the adjacent pair with the LOWEST merge rank is
    * merged (all its occurrences, left to right) until no adjacent pair
    * is in the table. Output: the document's token array, word by word.
    * Case is preserved and no characters are invented or dropped —
    * concatenating the tokens reproduces the document's non-whitespace
    * code points exactly (the conservation law the t23 gate checks).
    *
    * Scale: a learned merge list (10⁴–10⁵ rules) is <1 MB as a hash map
    * riding the plan to every executor; tokenization is a zero-shuffle
    * scan projection. The merge loop is O(|word|²·rules-hit) worst case
    * per word — words are short (whitespace pre-tokenization bounds
    * them), which is why every production BPE pre-tokenizes the same
    * way. */
  case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "bpe_tokenize"

    // rank table keyed by "left right" — a space cannot occur inside a
    // merge symbol (symbols are born from whitespace-split words, and
    // \s+ removes every space), which is also why merges.txt files use
    // the same encoding; any OTHER separator (a NUL, say) could collide
    // on dirty text, since \s+ does not strip control bytes
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      var i = 0
      merges.foreach { case (l, r) =>
        val k = l + " " + r
        if (!m.containsKey(k)) m.put(k, Integer.valueOf(i))
        i += 1
      }
      m
    }

    private def tokenizeWord(word: String, out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
      // split into code-point symbols (never through a surrogate pair)
      var parts = new scala.collection.mutable.ArrayBuffer[String](word.length)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        parts += word.substring(i, i + n)
        i += n
      }
      var done = parts.length < 2
      while (!done) {
        // lowest-rank adjacent pair present in the table
        var best = -1
        var bestRank = Int.MaxValue
        var j = 0
        while (j < parts.length - 1) {
          val r = rank.get(parts(j) + " " + parts(j + 1))
          if ((r ne null) && r.intValue() < bestRank) { bestRank = r.intValue(); best = j }
          j += 1
        }
        if (best < 0) done = true
        else {
          // merge EVERY occurrence of that pair, left to right
          val l = parts(best)
          val r = parts(best + 1)
          val next = new scala.collection.mutable.ArrayBuffer[String](parts.length)
          var k = 0
          while (k < parts.length) {
            if (k < parts.length - 1 && parts(k) == l && parts(k + 1) == r) {
              next += l + r; k += 2
            } else { next += parts(k); k += 1 }
          }
          parts = next
          done = parts.length < 2
        }
      }
      parts.foreach(p => out += UTF8String.fromString(p))
    }

    protected override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString.trim.split("\\s+", -1)
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) tokenizeWord(words(i), out)
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("bpeExpr", this, classOf[BpeTokenize].getName)
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($s);")
    }
    override protected def withNewChildInternal(c: Expression): BpeTokenize =
      copy(child = c)
  }

  def bpeTokenize(c: Column, merges: Seq[(String, String)]): Column =
    Shim.column(BpeTokenize(Shim.expression(c), merges))

  /** Viterbi segmentation of one word under a unigram-LM piece table —
    * shared by the [[UnigramTokenize]] apply kernel and the hard-EM fit
    * ([[graft.ext.TextAnalysis.unigramFitLocal]]'s E-step), so training
    * and inference segment IDENTICALLY by construction. Scores are
    * integer MICRO-NATS (log-prob × 1e6, negative) — all-integer DP, no
    * float tie ambiguity. dp maximizes total score; ties prefer the
    * LONGER last piece (smaller split point), deterministically. Every
    * single code point must be in `score` (the fit guarantees it);
    * an out-of-vocabulary code point scores `oovScore` so dirty corpus
    * text degrades loudly-low instead of crashing the kernel.
    * Segmentation is over code points — never through a surrogate pair. */
  private[graft] def viterbiSegment(
      word: String, score: java.util.HashMap[String, java.lang.Long],
      maxPieceCp: Int, oovScore: Long): Array[String] = {
    // code-point boundaries
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](word.length + 1)
    var i = 0
    bounds += 0
    while (i < word.length) {
      i += Character.charCount(word.codePointAt(i))
      bounds += i
    }
    val n = bounds.length - 1 // number of code points
    if (n == 0) return Array.empty
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, Long.MinValue)
    dp(0) = 0L
    var e = 1
    while (e <= n) {
      var s = math.max(0, e - maxPieceCp)
      // scan split points ascending: on ties, the SMALLEST s (longest
      // last piece) wins via strict > below
      while (s < e) {
        if (dp(s) != Long.MinValue) {
          val piece = word.substring(bounds(s), bounds(e))
          val sc: java.lang.Long = score.get(piece)
          val pieceScore: Long =
            if (sc ne null) sc.longValue()
            else if (e - s == 1) oovScore
            else Long.MinValue
          if (pieceScore != Long.MinValue && dp(s) + pieceScore > dp(e)) {
            dp(e) = dp(s) + pieceScore
            back(e) = s
          }
        }
        s += 1
      }
      e += 1
    }
    // backtrack
    val rev = new scala.collection.mutable.ArrayBuffer[String]()
    var p = n
    while (p > 0) {
      val s = back(p)
      rev += word.substring(bounds(s), bounds(p))
      p = s
    }
    rev.reverseIterator.toArray
  }

  /** `unigram_tokenize(string)`: SentencePiece-style Unigram-LM subword
    * segmentation (Kudo 2018) — per whitespace-word Viterbi under a
    * fixed piece table, [[BpeTokenize]]'s sibling kernel: the vocab
    * (piece → micro-nat log-prob) rides the expression as a reference
    * object, one HashMap probe per (position, length≤maxPieceCp) pair,
    * zero shuffles — the apply side of a fit that trained on a bounded
    * sample ([[graft.ext.TextAnalysis.unigramFitLocal]]). */
  case class UnigramTokenize(child: Expression, vocab: Seq[(String, Long)])
      extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "unigram_tokenize"

    @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
      m
    }
    @transient private lazy val maxPieceCp: Int =
      if (vocab.isEmpty) 1
      else vocab.iterator.map(v => v._1.codePointCount(0, v._1.length)).max
    @transient private lazy val oovScore: Long =
      if (vocab.isEmpty) -1000000L
      else vocab.iterator.map(_._2).min - 1000000L // worse than any real piece

    protected override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString.trim.split("\\s+", -1)
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty)
          viterbiSegment(words(i), table, maxPieceCp, oovScore)
            .foreach(p => out += UTF8String.fromString(p))
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("uniExpr", this, classOf[UnigramTokenize].getName)
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($s);")
    }
    override protected def withNewChildInternal(c: Expression): UnigramTokenize =
      copy(child = c)
  }

  def unigramTokenize(c: Column, vocab: Seq[(String, Long)]): Column =
    Shim.column(UnigramTokenize(Shim.expression(c), vocab))

  private[graft] def sqlBuilders
      : Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "nfc_normalize" -> (es => NfcNormalize(es(0))),
    "char_entropy" -> (es => CharEntropy(es(0))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Shim.registerFunction(spark, n, b) }
}
