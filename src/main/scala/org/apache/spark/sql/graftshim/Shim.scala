package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` surface (this file lives under
  * `org.apache.spark.sql` solely to satisfy the access qualifier — the same
  * technique used by typed-DataFrame libraries in the Spark ecosystem).
  *
  * Two capabilities:
  *  - wrap a custom Catalyst [[Expression]] as a user-facing [[Column]]
  *    (the classic-mode converter `ExpressionUtils.column`);
  *  - register a custom expression in the session's FunctionRegistry so it
  *    is also callable from `spark.sql(...)` text.
  */
object Shim {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Materialize a logical plan as a DataFrame (the classic
    * `Dataset.ofRows` factory) — what a RunnableCommand needs to turn
    * its captured query subtree back into a runnable frame. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A streaming-tagged DataFrame over an already-planned batch
    * computation — what a V1 streaming `Source.getBatch` must return
    * (MicroBatchExecution asserts `isStreaming`; the builtin V1
    * sources use exactly this factory). */
  def streamingFrame(spark: SparkSession,
                     rdd: org.apache.spark.rdd.RDD[
                       org.apache.spark.sql.catalyst.InternalRow],
                     schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse re-wrap for a V1 streaming `Sink.addBatch`: the frame
    * the engine hands in carries the incremental plan, which cannot be
    * re-planned by arbitrary batch consumers — materialize its RDD and
    * rebuild a plain batch frame over it (Spark's own ForeachBatchSink
    * does exactly this). */
  def batchFrame(spark: SparkSession,
                 df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
        isStreaming = false)

  /** Idempotently register `builder` under `name` in `spark`'s function
    * registry (session-local, no extension-loading required). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registry = classic.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      val info = new ExpressionInfo("graft", name)
      registry.registerFunction(id, info, builder)
    }
  }
}
