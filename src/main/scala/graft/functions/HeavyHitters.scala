package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a mergeable
  * `TypedImperativeAggregate` — the SCALE tier for exact term counting
  * (t10's `explode → groupBy(term)` shuffles one row per distinct term;
  * this aggregate's exchange carries at most `budget` entries per map
  * task regardless of vocabulary size, the w9/w11 sketch discipline
  * applied to frequency).
  *
  * Algorithm: classic Misra–Gries with the buffered-compaction
  * formulation (amortized O(1) update — counts accumulate unbounded in a
  * local map up to 4×budget, then one O(size) compaction subtracts the
  * (budget+1)-th largest value from every entry and drops the non-
  * positive). Merges (Agarwal et al., "Mergeable Summaries", PODS'12)
  * add counterpart counters and re-compact, preserving the deterministic
  * error bound: for every term,
  *
  *   true(t) − n/(budget+1)  ≤  est(t)  ≤  true(t)
  *
  * where n is the TOTAL stream length — so every term with
  * `true(t) · (budget+1) > n` is GUARANTEED present in the summary
  * (its lower bound cannot reach zero). The t21 gate checks exactly that
  * guarantee plus both bound sides against the exact counts, in integer
  * arithmetic.
  *
  * The summary CONTENT below the guarantee line is arrival-order- and
  * partitioning-dependent (as with every MG sketch), so the judged gate
  * emits invariant FLAGS, never the raw sketch.
  */
object HeavyHitters {

  /** MG buffer: term → count, compacted to ≤ budget entries whenever the
    * map outgrows 4×budget (or on demand at merge/eval boundaries). */
  final class MGBuffer(val budget: Int) {
    val counts = new java.util.HashMap[String, Long]()
    private val cap = 4 * budget

    def offer(term: String, w: Long): Unit = {
      counts.merge(term, w, (a, b) => a + b)
      if (counts.size() > cap) compact()
      ()
    }

    /** Subtract the (budget+1)-th largest count from every entry, drop
      * the non-positive — one MG reduction step over the buffered mass. */
    def compact(): Unit = if (counts.size() > budget) {
      val vals = new Array[Long](counts.size())
      var i = 0
      val it = counts.values().iterator()
      while (it.hasNext) { vals(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - (budget + 1)) // (budget+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - m
        if (nv <= 0) eit.remove() else e.setValue(nv)
      }
    }
  }

  /** `mg_topk(term string, budget)` → `array<struct<term string, est bigint>>`
    * sorted est desc, term asc (of whatever survives compaction). */
  case class MgTopK(
      termExpr: Expression,
      budget: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {

    override def children: Seq[Expression] = Seq(termExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "mg_topk"

    override def checkInputDataTypes(): TypeCheckResult =
      if (budget <= 0) TypeCheckResult.TypeCheckFailure(s"budget must be positive, got $budget")
      else if (termExpr.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"expected string term, got ${termExpr.dataType.simpleString}")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): MGBuffer = new MGBuffer(budget)

    override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
      val t = termExpr.eval(input)
      if (t != null) b.offer(t.toString, 1L)
      b
    }

    override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = {
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b.offer(e.getKey, e.getValue)
      }
      b
    }

    override def eval(b: MGBuffer): Any = {
      b.compact()
      val entries = new Array[(String, Long)](b.counts.size())
      var i = 0
      val it = b.counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
      val sorted = entries.sortBy { case (t, c) => (-c, t) }
      new GenericArrayData(sorted.map { case (t, c) =>
        InternalRow(UTF8String.fromString(t), c)
      }.toIndexedSeq)
    }

    override def serialize(b: MGBuffer): Array[Byte] = {
      b.compact() // ship ≤ budget entries across the exchange
      val terms = new Array[Array[Byte]](b.counts.size())
      val cnts = new Array[Long](b.counts.size())
      var total = 4
      var i = 0
      val it = b.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        terms(i) = e.getKey.getBytes(StandardCharsets.UTF_8)
        cnts(i) = e.getValue
        total += 4 + terms(i).length + 8
        i += 1
      }
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.putInt(i)
      var j = 0
      while (j < i) {
        bb.putInt(terms(j).length); bb.put(terms(j)); bb.putLong(cnts(j))
        j += 1
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): MGBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new MGBuffer(budget)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val t = new Array[Byte](len)
        bb.get(t)
        b.counts.put(new String(t, StandardCharsets.UTF_8), bb.getLong)
        i += 1
      }
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): MgTopK =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MgTopK =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MgTopK =
      copy(termExpr = cs(0))
  }

  // ----------------------------------------------------------- Column API

  def mgTopK(term: Column, budget: Int): Column =
    Shim.column(MgTopK(Shim.expression(term), budget).toAggregateExpression())

  /** `mg_topk(term, budget)` for `spark.sql` text (budget must be an
    * integer literal — it sizes the buffer at plan time). */
  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mg_topk" -> (es => {
      require(es.length == 2,
        s"mg_topk expects 2 arguments (term, budget), got ${es.length}")
      require(es(1).foldable, "budget must be a literal")
      val b = es(1).eval(null) match {
        case i: Int => i; case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"budget must be an int literal, got $other")
      }
      MgTopK(es(0), b).toAggregateExpression()
    }))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Shim.registerFunction(spark, n, b) }
}
