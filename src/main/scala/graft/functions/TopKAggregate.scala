package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Bounded top-k-by aggregate: for each group, the ids of the `k` rows with
  * the highest score (score desc, id asc tie-break), as a sorted array.
  *
  * This is the scale-critical alternative to the
  * `row_number().over(Window.partitionBy(key).orderBy(score.desc))` idiom
  * used by k-NN ranking: the window form shuffles and sorts EVERY candidate
  * pair (O(n·c) rows for n query vectors with c candidates each), while this
  * aggregate is a partial-mergeable `TypedImperativeAggregate` — each map
  * task reduces its slice to ≤ k entries per group before the exchange, so
  * the shuffle carries O(n·k) tiny rows no matter how many candidates the
  * join emitted. On a 1000-executor cluster the candidate join's output
  * never materializes through a sort.
  *
  * Ordering semantics are pinned to Spark's/DuckDB's SQL ordering
  * (`java.lang.Double.compare`): NaN ranks above +Inf, -0.0 < 0.0 — so the
  * result is bit-identical to the window formulation it replaces (verified
  * by TopKSpec and the unchanged e1 oracle hash).
  */
object TopKAggregate {

  /** Insertion-sorted bounded buffer of (score, id), best first. k is tiny
    * (3..100) so O(k) shifts beat a heap's constant factor and give us the
    * exact tie-break ordering for free.
    *
    * Ordering domain matches the SQL window `ORDER BY score DESC, id ASC`
    * it replaces, including NULL handling: descending order puts NULL
    * scores LAST (after -Inf), and NaN first — so a group with fewer than
    * k non-null scores still emits its null-score rows, exactly like
    * `row_number` did. Null scores are encoded as a flag ranking below
    * every double; `better` is a total order. */
  final class TopKBuffer(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    val nulls = new Array[Boolean](k)
    var size = 0

    @inline private def better(s1: Double, n1: Boolean, i1: Long,
                               s2: Double, n2: Boolean, i2: Long): Boolean =
      if (n1 != n2) n2 // non-null beats null
      else {
        val c = if (n1) 0 else java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }

    def insert(s: Double, id: Long): Unit = insert0(s, nul = false, id)
    def insertNullScore(id: Long): Unit = insert0(0.0, nul = true, id)

    private def insert0(s: Double, nul: Boolean, id: Long): Unit = {
      var i =
        if (size < k) size
        else if (better(s, nul, id, scores(k - 1), nulls(k - 1), ids(k - 1))) k - 1
        else return
      while (i > 0 && better(s, nul, id, scores(i - 1), nulls(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); nulls(i) = nulls(i - 1); ids(i) = ids(i - 1)
        i -= 1
      }
      scores(i) = s; nulls(i) = nul; ids(i) = id
      if (size < k) size += 1
    }
  }

  /** `topk_ids_by(score double, id long, k)` → `array<long>`: ids of the
    * k highest-scoring rows in the group, score desc / id asc. */
  case class TopKIdsBy(
      scoreExpr: Expression,
      idExpr: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

    override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "topk_ids_by"

    override def checkInputDataTypes(): TypeCheckResult =
      if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
      else if (scoreExpr.dataType != DoubleType || idExpr.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"expected (double, bigint), got (${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
      val s = scoreExpr.eval(input)
      val id = idExpr.eval(input)
      if (id != null) {
        if (s != null) b.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
        else b.insertNullScore(id.asInstanceOf[Long]) // DESC NULLS LAST
      }
      b
    }

    override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
      var i = 0
      while (i < o.size) {
        if (o.nulls(i)) b.insertNullScore(o.ids(i)) else b.insert(o.scores(i), o.ids(i))
        i += 1
      }
      b
    }

    override def eval(b: TopKBuffer): Any = {
      val out = new Array[Any](b.size)
      var i = 0
      while (i < b.size) { out(i) = b.ids(i); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(b: TopKBuffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + b.size * 17)
      bb.putInt(b.size)
      var i = 0
      while (i < b.size) {
        bb.putDouble(b.scores(i)); bb.putLong(b.ids(i))
        bb.put(if (b.nulls(i)) 1.toByte else 0.toByte)
        i += 1
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new TopKBuffer(k)
      var i = 0
      // entries arrive best-first, so each insert appends in O(1) shifts
      while (i < n) {
        val s = bb.getDouble; val id = bb.getLong; val nul = bb.get() == 1
        if (nul) b.insertNullScore(id) else b.insert(s, id)
        i += 1
      }
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKIdsBy =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKIdsBy =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKIdsBy =
      copy(scoreExpr = cs(0), idExpr = cs(1))
  }

  // ----------------------------------------------------------- Column API

  def topkIdsBy(score: Column, id: Column, k: Int): Column =
    Shim.column(TopKIdsBy(Shim.expression(score), Shim.expression(id), k)
      .toAggregateExpression())

  /** `topk_ids_by(score, id, k)` for `spark.sql` text (k must be an
    * integer literal — it sizes the aggregation buffer at plan time). */
  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "topk_ids_by" -> (es => {
      require(es.length == 3,
        s"topk_ids_by expects 3 arguments (score, id, k), got ${es.length}")
      require(es(2).foldable, "k must be a literal")
      val k = es(2).eval(null) match {
        case i: Int => i; case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
      }
      TopKIdsBy(es(0), es(1), k).toAggregateExpression()
    }))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (n, b) => Shim.registerFunction(spark, n, b) }
}
