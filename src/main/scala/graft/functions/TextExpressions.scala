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

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Shim.registerFunction(spark, "nfc_normalize", es => NfcNormalize(es(0)))
}
