package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-pair / per-row kernels of the
  * similarity and dedup operators.
  *
  * Why not `zip_with`/`aggregate` HOFs: lambda-bearing higher-order
  * functions are evaluated by the interpreter (they opt out of whole-stage
  * codegen), so a k-NN join computing cosine over 25M candidate pairs pays
  * an interpreted 64-element fold per pair. These expressions generate a
  * tight primitive loop over the underlying `ArrayData` instead — no
  * boxing, no per-element closures, inlined into the whole-stage-codegen'd
  * join stage. At 100 TB the candidate-pair kernels are the single biggest
  * CPU consumer of the similarity path; this is the piece worth dropping to
  * custom-Expression level for (SURVEY.md §7.3).
  *
  * Float arrays accumulate in double — identical FP result to the
  * sequential HOF fold (same order, same widening), so oracle hashes are
  * unchanged.
  */
object VectorExpressions {

  private def elemPrim(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "Float"
    case ArrayType(DoubleType, _) => "Double"
    case _ => ""
  }

  private def checkVecTypes(exprs: Expression*): TypeCheckResult = {
    val ok = exprs.forall(e => elemPrim(e.dataType).nonEmpty)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<float>/array<double>, got ${exprs.map(_.dataType.simpleString).mkString(", ")}")
  }

  /** Σ aᵢ·bᵢ over two numeric arrays (double accumulator, sequential). */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = checkVecTypes(left, right)
    override def prettyName: String = "vec_dot"

    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(aa.numElements(), bb.numElements())
      val isFloat = elemPrim(left.dataType) == "Float"
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (!aa.isNullAt(i) && !bb.isNullAt(i)) {
          sum +=
            (if (isFloat) aa.getFloat(i).toDouble else aa.getDouble(i)) *
              (if (elemPrim(right.dataType) == "Float") bb.getFloat(i).toDouble else bb.getDouble(i))
        }
        i += 1
      }
      sum
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (ga, gb) = (s"get${elemPrim(left.dataType)}", s"get${elemPrim(right.dataType)}")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("sum")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $s += (double) $a.$ga($i) * (double) $b.$gb($i);
           |  }
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** Cosine similarity in one pass: dot/(√Σa²·√Σb²). Zero-norm → NaN
    * (matches the divide-by-zero behavior of the composed-HOF form). */
  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = checkVecTypes(left, right)
    override def prettyName: String = "vec_cosine"

    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(aa.numElements(), bb.numElements())
      val fa = elemPrim(left.dataType) == "Float"
      val fb = elemPrim(right.dataType) == "Float"
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (fa) aa.getFloat(i).toDouble else aa.getDouble(i)
        val y = if (fb) bb.getFloat(i).toDouble else bb.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (ga, gb) = (s"get${elemPrim(left.dataType)}", s"get${elemPrim(right.dataType)}")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val d = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.$ga($i);
           |  double $y = (double) $b.$gb($i);
           |  $d += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** MinHash signature: k minima of affine permutations ((h mod p)·aⱼ+bⱼ)
    * mod p of the input 64-bit shingle hashes (p = 2³¹−1; identical
    * arithmetic to the HOF formulation in [[graft.ext.TextDedup]], which it
    * replaces on the hot path — one compiled pass instead of k interpreted
    * `transform`+`array_min` traversals). */
  case class MinHashSig(child: Expression, k: Int, seed: Long) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got ${dt.simpleString}")
    }
    override def prettyName: String = "minhash_sig"

    private val P = 2147483647L // 2^31 - 1, Mersenne prime
    // affine params pinned at plan construction — deterministic given seed
    private lazy val (as, bs): (Array[Long], Array[Long]) = {
      // interleaved (a,b) draws — the exact sequence of the HOF form in
      // graft.ext.TextDedup.perms, so both produce identical signatures
      val rnd = new scala.util.Random(seed)
      val pairs = Array.fill(k)(
        (math.abs(rnd.nextLong()) % (P - 1) + 1, math.abs(rnd.nextLong()) % P))
      (pairs.map(_._1), pairs.map(_._2))
    }

    protected override def nullSafeEval(input: Any): Any = {
      val hashes = input.asInstanceOf[ArrayData]
      val n = hashes.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!hashes.isNullAt(i)) {
          // pmod(h, P): java % keeps sign, add P when negative
          val hm = { val m = hashes.getLong(i) % P; if (m < 0) m + P else m }
          var j = 0
          while (j < k) {
            val v = { val m = (hm * as(j) + bs(j)) % P; if (m < 0) m + P else m }
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      nullSafeCodeGen(ctx, ev, h => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val mins = ctx.freshName("mins"); val hm = ctx.freshName("hm"); val v = ctx.freshName("v")
        s"""
           |int $n = $h.numElements();
           |long[] $mins = new long[$k];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$h.isNullAt($i)) {
           |    long $hm = $h.getLong($i) % ${P}L; if ($hm < 0) $hm += ${P}L;
           |    for (int $j = 0; $j < $k; $j++) {
           |      long $v = ($hm * $aRef[$j] + $bRef[$j]) % ${P}L; if ($v < 0) $v += ${P}L;
           |      if ($v < $mins[$j]) $mins[$j] = $v;
           |    }
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** Distinct word n-gram shingle hashes straight from the text: tokenize
    * on whitespace, form n-grams joined by a single space, xxhash64 each
    * (seed 42 = `functions.xxhash64`), dedupe preserving first occurrence.
    * One compiled pass replacing a split/sequence/slice/concat_ws/
    * array_distinct/transform chain of interpreted HOFs. Produces exactly
    * the hash set of `TextDedup.shingleHashes(TextDedup.shingles(c, n))`
    * (texts with fewer than n tokens collapse to one all-token shingle). */
  case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "shingle_hash64"

    protected override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      // split(trim(c), "\\s+") semantics: trim first; split of "" -> [""]
      val toks = text.trim.split("\\s+", -1)
      val m = math.max(toks.length - n + 1, 1)
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < m) {
        val hi = math.min(i + n, toks.length)
        val sb = new java.lang.StringBuilder()
        var j = i
        while (j < hi) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        val s = UTF8String.fromString(sb.toString)
        seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k0 = 0
      while (it.hasNext) { out(k0) = it.next(); k0 += 1 }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("shingleExpr", this, classOf[ShingleHash64].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($t);")
    }

    override protected def withNewChildInternal(c: Expression): ShingleHash64 = copy(child = c)
  }

  /** ALL token n-gram hashes in POSITION order (index i = the gram
    * starting at token i; NO dedup — [[ShingleHash64]]'s set semantics
    * would erase the positions span detection needs). Docs with fewer
    * than n tokens yield an EMPTY array (a partial gram is not a gram —
    * matches the d11 oracle's `len(t) >= n` guard). One compiled pass:
    * one split, one rolling string build per position — replacing a
    * `transform(sequence…)` whose lambda re-ran the regex split per
    * element (measured 10× slower at sf0.1). */
  case class GramHash64(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "gram_hash64"

    protected override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = text.trim.split("\\s+", -1)
      if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
      val m = toks.length - n + 1
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder()
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromString(sb.toString), 42L)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("gramExpr", this, classOf[GramHash64].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($t);")
    }

    override protected def withNewChildInternal(c: Expression): GramHash64 = copy(child = c)
  }

  /** Bloom-filter membership prescreen over a 64-bit hash column. Holds a
    * driver-built `org.apache.spark.util.sketch.BloomFilter` (Serializable;
    * ships to executors inside the plan's reference array) and generates a
    * direct `mightContainLong` call inside whole-stage codegen — the
    * corpus-side scan stays one shuffle-free compiled pass. One-sided
    * error: never false on a member, so an exact verify join downstream
    * loses nothing (the d13 contract). */
  case class BloomMightContainLong(
      child: Expression,
      filter: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected bigint, got ${dt.simpleString}")
    }
    override def prettyName: String = "bloom_might_contain_long"

    protected override def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $bf.mightContainLong($v);")
    }

    override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
      copy(child = c)
  }

  /** 64-bit SimHash over an array of string tokens: per bit, +1/−1 votes
    * from each token's xxhash64 (seed 42, same as `functions.xxhash64`);
    * bit set where the vote is positive. Replaces a 64-wide interpreted
    * `aggregate`/`zip_with` pyramid with one compiled pass. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got ${dt.simpleString}")
    }
    override def prettyName: String = "simhash64"

    protected override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        if (!toks.isNullAt(i)) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(toks.getUTF8String(i), 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
      out
    }

    // eval is one compiled pass already; the expression sits in a cheap
    // per-doc projection, so interpreted dispatch around it is negligible.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
      nullSafeCodeGen(ctx, ev, t => s"${ev.value} = (Long) $self.nullSafeEval($t);")
    }

    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** Sign-bit bucket of a vector against a plane matrix: bit i set when
    * v·planes(i) > 0. The matrix rides as a REFERENCE OBJECT, not a
    * literal tree — an `array(lit…)` encoding of 48 planes × 64 dims
    * inflates the generated class past the JIT's comfort (measured: the
    * Janino blowup filled the JVM code cache and de-optimized every later
    * query in the session). */
  case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = checkVecTypes(child)
    override def prettyName: String = "hyperplane_bucket"

    protected override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val isFloat = elemPrim(child.dataType) == "Float"
      var bucket = 0L
      var i = 0
      while (i < planes.length) {
        val p = planes(i)
        val n = math.min(v.numElements(), p.length)
        var d = 0.0
        var j = 0
        while (j < n) {
          d += (if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)) * p(j)
          j += 1
        }
        if (d > 0) bucket |= (1L << i)
        i += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("hpExpr", this, classOf[HyperplaneBucket].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (Long) $self.nullSafeEval($v);")
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
      copy(child = c)
  }

  /** Product-quantization ENCODE (Jégou et al., PAMI 2011): the vector
    * split into `codebooks.length` contiguous subspaces, each mapped to
    * the index of its nearest sub-centroid (squared L2, ties by index).
    * Output: array<int> of m codes — the 8-byte-per-vector storage form
    * at m=8. Codebooks ride as a reference object (see
    * [[HyperplaneBucket]]'s note on literal-tree JIT blowup). */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = checkVecTypes(child)
    override def prettyName: String = "pq_encode"

    protected override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val isFloat = elemPrim(child.dataType) == "Float"
      val m = codebooks.length
      val out = new Array[Int](m)
      var s = 0
      var off = 0
      while (s < m) {
        val book = codebooks(s)
        val dsub = book(0).length
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cc = book(c)
          var d = 0.0
          var j = 0
          while (j < dsub && off + j < v.numElements()) {
            val x = (if (isFloat) v.getFloat(off + j).toDouble
                     else v.getDouble(off + j)) - cc(j)
            d += x * x
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best
        off += dsub
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($v);")
    }
    override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  }

  /** Product-quantization DECODE: codes back to the concatenation of
    * their sub-centroids (array<float>, ready for the cosine kernels).
    * `cosine(query, pq_decode(codes))` IS the asymmetric distance
    * computation — the LUT form is an evaluation-order optimization of
    * the same quantity. */
  case class PqDecode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected array<int>, got ${dt.simpleString}")
    }
    override def prettyName: String = "pq_decode"

    protected override def nullSafeEval(input: Any): Any = {
      val codes = input.asInstanceOf[ArrayData]
      // fail LOUDLY on shape/domain mismatch: clamping a corrupt code or
      // zero-filling missing subspaces would produce a plausible-looking
      // wrong vector whose recon-cosine may stay above the e11 floor —
      // masking exactly the corruption the gate exists to catch
      if (codes.numElements() != codebooks.length)
        throw new IllegalArgumentException(
          s"pq_decode: ${codes.numElements()} codes for ${codebooks.length} codebooks")
      var dim = 0
      var s = 0
      while (s < codebooks.length) { dim += codebooks(s)(0).length; s += 1 }
      val out = new Array[Float](dim)
      var off = 0
      s = 0
      while (s < codebooks.length) {
        val book = codebooks(s)
        val code = codes.getInt(s)
        if (code < 0 || code >= book.length)
          throw new IllegalArgumentException(
            s"pq_decode: code $code out of [0, ${book.length}) in subspace $s")
        val cc = book(code)
        var j = 0
        while (j < cc.length) { out(off + j) = cc(j).toFloat; j += 1 }
        off += cc.length
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("pqDec", this, classOf[PqDecode].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($v);")
    }
    override protected def withNewChildInternal(c: Expression): PqDecode = copy(child = c)
  }

  /** Indices of the `nProbe` nearest centroids (squared L2), ascending by
    * distance, ties by index — the IVF cell assignment, one compiled pass
    * with the centroid matrix as a reference object. */
  case class NearestCells(
      child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = checkVecTypes(child)
    override def prettyName: String = "nearest_cells"

    protected override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val isFloat = elemPrim(child.dataType) == "Float"
      val dists = new Array[Double](centroids.length)
      var c = 0
      while (c < centroids.length) {
        val cc = centroids(c)
        val n = math.min(v.numElements(), cc.length)
        var d = 0.0
        var j = 0
        while (j < n) {
          val x = (if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)) - cc(j)
          d += x * x
          j += 1
        }
        dists(c) = d
        c += 1
      }
      val k = math.min(nProbe, centroids.length)
      val out = new Array[Int](k)
      val used = new Array[Boolean](centroids.length)
      var s = 0
      while (s < k) {
        var best = -1
        var bestD = Double.MaxValue
        var i = 0
        while (i < centroids.length) {
          if (!used(i) && dists(i) < bestD) { bestD = dists(i); best = i }
          i += 1
        }
        used(best) = true
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nearExpr", this, classOf[NearestCells].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($v);")
    }
    override protected def withNewChildInternal(c: Expression): NearestCells =
      copy(child = c)
  }

  /** The full Gopher repetition battery (Rae et al. 2021 A1.1) in ONE
    * compiled pass per document — the kernel behind
    * `TextAnalysis.gopherRepetition`. A declarative HOF formulation
    * exists (`TextAnalysis.gopherRepetitionHof`, the spec-pinned
    * reference twin), but Catalyst re-evaluates a lambda's captured
    * arrays PER ELEMENT (the d11/GramHash64 lesson), turning its sorted-
    * array folds into O(W²·log W) on repetitive mega-docs; this
    * expression is one split + hash-map counting + a linear interval
    * sweep, O(W·gram) with no per-element re-evaluation, and stays
    * inside the whole-stage span via the reference-object trampoline.
    *
    * Semantics (bit-identical to the HOF twin, ASCII and beyond):
    * char counts are CODEPOINTS (Spark `length`/DuckDB `length`), gram
    * tie-breaks compare UTF-8 BYTES (Spark `array_sort` on strings /
    * DuckDB collation), bp = ⌊10⁴·num/den⌋ in double (0 when den = 0,
    * matching Cast(NaN→long)); output struct fields mirror the twin. */
  case class GopherRepetition(child: Expression, lineWords: Int,
                              topN: Int, dupN: Int) extends UnaryExpression {
    require(lineWords > 0 && topN > 0 && dupN > 0)
    override def dataType: DataType = StructType(Seq(
      StructField("n_lines", LongType, nullable = false),
      StructField("dup_line_bp", LongType, nullable = false),
      StructField("dup_line_char_bp", LongType, nullable = false),
      StructField("top_gram_bp", LongType, nullable = false),
      StructField("dup_gram_bp", LongType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected string, got ${dt.simpleString}")
    }
    override def prettyName: String = "gopher_repetition"

    private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
    private def utf8Lt(a: String, b: String): Boolean =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
    private def bp(num: Long, den: Long): Long =
      if (den <= 0L) 0L else math.floor(10000.0 * num / den).toLong

    protected override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+", -1)
      val w = toks.length
      var wordChars = 0L
      var i = 0
      while (i < w) { wordChars += cpLen(toks(i)); i += 1 }
      val normLen = wordChars + (w - 1)

      def joined(from: Int, len: Int): String = {
        val hi = math.min(from + len, w)
        val sb = new java.lang.StringBuilder()
        var j = from
        while (j < hi) { if (j > from) sb.append(' '); sb.append(toks(j)); j += 1 }
        sb.toString
      }

      // lines: lineWords-word segments
      val nLines = (w - 1) / lineWords + 1
      val lineCnt = new java.util.HashMap[String, Int]()
      i = 0
      while (i < nLines) {
        lineCnt.merge(joined(i * lineWords, lineWords), 1, Integer.sum _)
        i += 1
      }
      var dupLineCnt = 0L; var dupLineChars = 0L
      val lit0 = lineCnt.entrySet().iterator()
      while (lit0.hasNext) {
        val e = lit0.next()
        if (e.getValue > 1) {
          dupLineCnt += e.getValue
          dupLineChars += e.getValue * cpLen(e.getKey)
        }
      }

      // top topN-gram: max count, UTF-8-lexicographic tie-break
      val gTop = math.max(w - topN + 1, 1)
      val topCnt = new java.util.HashMap[String, Int]()
      i = 0
      while (i < gTop) { topCnt.merge(joined(i, topN), 1, Integer.sum _); i += 1 }
      var bestGram: String = null; var bestCnt = 0
      val tit = topCnt.entrySet().iterator()
      while (tit.hasNext) {
        val e = tit.next()
        if (e.getValue > bestCnt ||
            (e.getValue == bestCnt && utf8Lt(e.getKey, bestGram))) {
          bestCnt = e.getValue; bestGram = e.getKey
        }
      }
      val topChars = bestCnt.toLong * cpLen(bestGram)

      // duplicated dupN-gram coverage: linear interval-union sweep over
      // ascending starts of grams whose in-doc count >= 2
      val gDup = math.max(w - dupN + 1, 1)
      val grams = new Array[String](gDup)
      val dupCnt = new java.util.HashMap[String, Int]()
      i = 0
      while (i < gDup) {
        grams(i) = joined(i, dupN)
        dupCnt.merge(grams(i), 1, Integer.sum _)
        i += 1
      }
      val pfx = new Array[Long](w + 1)
      i = 0
      while (i < w) { pfx(i + 1) = pfx(i) + cpLen(toks(i)); i += 1 }
      var covered = 0L; var e0 = 0
      i = 0
      while (i < gDup) {
        if (dupCnt.get(grams(i)) > 1) {
          val from = math.max(e0, i)
          val to = math.min(i + dupN, w)
          if (to > from) { covered += pfx(to) - pfx(from); e0 = to }
        }
        i += 1
      }

      org.apache.spark.sql.catalyst.InternalRow(
        nLines.toLong,
        bp(dupLineCnt, nLines.toLong),
        bp(dupLineChars, normLen),
        math.min(bp(topChars, normLen), 10000L),
        bp(covered, wordChars))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("gopherExpr", this, classOf[GopherRepetition].getName)
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.nullSafeEval($t);")
    }
    override protected def withNewChildInternal(c: Expression): GopherRepetition =
      copy(child = c)
  }

  // ----------------------------------------------------------- Column API

  def vecDot(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    Shim.column(CosineSim(Shim.expression(a), Shim.expression(b)))

  def minhashSig(hashes: Column, k: Int, seed: Long = 42L): Column =
    Shim.column(MinHashSig(Shim.expression(hashes), k, seed))

  def shingleHash64(text: Column, n: Int): Column =
    Shim.column(ShingleHash64(Shim.expression(text), n))

  def gopherRepetition(text: Column, lineWords: Int, topN: Int,
                       dupN: Int): Column =
    Shim.column(GopherRepetition(Shim.expression(text), lineWords, topN, dupN))

  def gramHash64(text: Column, n: Int): Column =
    Shim.column(GramHash64(Shim.expression(text), n))

  def bloomMightContainLong(hash: Column,
      filter: org.apache.spark.util.sketch.BloomFilter): Column =
    Shim.column(BloomMightContainLong(Shim.expression(hash), filter))

  // PQ kernels take a 3-D codebook reference object — deliberately NOT on
  // the SQL surface (lit2Matrix parses 2-D literals; a 3-D literal tree is
  // exactly the JIT blowup the reference-object pattern avoids)
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Shim.column(PqEncode(Shim.expression(vec), codebooks))

  def pqDecode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Shim.column(PqDecode(Shim.expression(codes), codebooks))

  def hyperplaneBucket(vec: Column, planes: Array[Array[Double]]): Column =
    Shim.column(HyperplaneBucket(Shim.expression(vec), planes))

  def nearestCells(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    Shim.column(NearestCells(Shim.expression(vec), centroids, nProbe))

  def simhash64(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens)))

  /** Seeded random-hyperplane matrix — the single source of truth for
    * both the Column API ([[graft.ext.Similarity.lshBucket]]) and the SQL
    * registration, so `hyperplane_bucket(vec, dim, bits, seed)` in SQL
    * buckets identically to the DataFrame path. */
  def seededPlanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Evaluate a foldable literal argument at registration time (k, n,
    * seed, probe counts — scalar dials, not data). */
  private def lit2Long(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def lit2Matrix(e: Expression, what: String): Array[Array[Double]] = {
    require(e.foldable, s"$what must be a literal array<array<numeric>>")
    val elemType = e.dataType match {
      case ArrayType(ArrayType(t, _), _) => t
      case other => throw new IllegalArgumentException(
        s"$what must be array<array<numeric>>, got ${other.simpleString}")
    }
    val outer = e.eval(null).asInstanceOf[ArrayData]
    val m = Array.tabulate(outer.numElements()) { i =>
      val row = outer.getArray(i)
      Array.tabulate(row.numElements()) { j =>
        row.get(j, elemType) match {
          case d: java.lang.Double => d.doubleValue()
          case f: java.lang.Float => f.toDouble
          case dec: Decimal => dec.toDouble
          case n: java.lang.Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"$what element is not numeric: $other")
        }
      }
    }
    if (m.isEmpty) throw new IllegalArgumentException(s"$what must be non-empty")
    m
  }

  /** Register every kernel for `spark.sql` use:
    * `vec_dot(a, b)`, `vec_cosine(a, b)`, `simhash64(tokens)`,
    * `minhash_sig(hashes, k, seed)`, `shingle_hash64(text, n)`,
    * `hyperplane_bucket(vec, dim, bits, seed)` (planes derived from the
    * seed exactly as the DataFrame path derives them), and
    * `nearest_cells(vec, centroids, nProbe)` with a literal centroid
    * matrix. SQL text and DataFrame code produce the same Expression
    * nodes, so results are bit-identical (SqlSurfaceSpec). */
  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => DotProduct(es(0), es(1))),
    "vec_cosine" -> (es => CosineSim(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es(0))),
    "minhash_sig" -> (es =>
      MinHashSig(es(0), lit2Long(es(1), "k").toInt, lit2Long(es(2), "seed"))),
    "shingle_hash64" -> (es =>
      ShingleHash64(es(0), lit2Long(es(1), "n").toInt)),
    "gram_hash64" -> (es =>
      GramHash64(es(0), lit2Long(es(1), "n").toInt)),
    "hyperplane_bucket" -> (es =>
      HyperplaneBucket(es(0), seededPlanes(
        lit2Long(es(1), "dim").toInt, lit2Long(es(2), "bits").toInt,
        lit2Long(es(3), "seed")))),
    "nearest_cells" -> (es =>
      NearestCells(es(0), lit2Matrix(es(1), "centroids"),
        lit2Long(es(2), "nProbe").toInt)),
    "gopher_repetition" -> (es =>
      GopherRepetition(es(0), lit2Long(es(1), "lineWords").toInt,
        lit2Long(es(2), "topN").toInt, lit2Long(es(3), "dupN").toInt)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Shim.registerFunction(spark, n, b) }
}
