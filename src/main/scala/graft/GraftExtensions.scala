package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-only enablement of every graft SQL kernel — the idiomatic
  * Spark extension route:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the same (name, builder) pairs `GraftSession.registerAll`
  * installs programmatically, so SQL-only consumers (JDBC/Thrift, notebook
  * users, `spark-sql`) get `vec_cosine`, `shingle_hash64`, `topk_ids_by`,
  * … without touching the library's Scala API. Builders are shared with
  * the session-local path (single source of truth in each kernel object),
  * so both routes produce identical Expression trees.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptions.foreach(ext.injectFunction)
    // s41: SQL-addressable snapshot tables — `graft_snap.<alias>`,
    // `<alias>__v<N>`, and `VERSION AS OF` resolve to the same
    // composed merge-on-read plan the Scala API builds
    ext.injectResolutionRule(session =>
      new graft.plans.SnapshotRelationRule(session))
    // s48: maintenance verbs Spark's grammar lacks (OPTIMIZE/VACUUM/
    // EXPIRE SNAPSHOTS/ROLLBACK over graft_snap tables) — everything
    // else delegates to Spark's own parser untouched
    ext.injectParser((_, parser) =>
      new graft.plans.GraftSqlParser(parser))
  }
}

object GraftExtensions {
  /** Every graft SQL kernel as an injectFunction description. */
  def functionDescriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = {
    val all = graft.functions.VectorExpressions.sqlBuilders ++
      graft.functions.TextExpressions.sqlBuilders ++
      graft.functions.TopKAggregate.sqlBuilders
    all.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
    }
  }
}
