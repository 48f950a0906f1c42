package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.ops.Snapshots

/** s41 — SQL-ADDRESSABLE snapshot tables (round-17; the r16 VERDICT's
  * #5): the lakehouse layer was Scala-API only — SQL-text consumers
  * (JDBC/Thrift, notebooks, `spark-sql`) could not name a snapshot
  * table in a query. This closes it the Catalyst-native way: a
  * RESOLUTION RULE (injected via [[graft.GraftExtensions]], Spark's
  * own `spark.sql.extensions` route) that resolves
  *
  *  - `graft_snap.<alias>`            → the registered table's current
  *    merge-on-read state,
  *  - `graft_snap.<alias>__v<N>`      → TIME TRAVEL to snapshot N, and
  *  - `... FROM graft_snap.<alias> VERSION AS OF N` — Spark's OWN
  *    time-travel syntax, matched on the parsed [[RelationTimeTravel]]
  *    node,
  *
  * by substituting the ANALYZED logical plan of [[Snapshots.read]] —
  * the same composed scan (delete anti-joins, schema-op projections)
  * the Scala API builds, so SQL text and DataFrame calls produce one
  * plan shape, with pushdown and pruning intact. No parquet reader is
  * re-implemented and no data is copied: the rule is pure plan
  * substitution, which is exactly what a DSv2 catalog would bolt on
  * top of.
  *
  * A bare `<alias>` also resolves, but only AFTER Spark's own
  * resolution declined it (injected rules run after the built-ins in
  * the same batch), so temp views and catalog tables always win —
  * the rule can never shadow real relations. Registration is
  * process-wide (one registry per JVM, like the builtin function
  * registry); aliases are case-insensitive. */
object SnapshotSql {

  /** The two-part namespace SQL text uses: `graft_snap.<alias>`. */
  val Namespace = "graft_snap"

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bind `alias` to a snapshot table root. Idempotent re-binds win. */
  def register(alias: String, tableDir: String): Unit = {
    require(alias.nonEmpty && alias.forall(c => c.isLetterOrDigit || c == '_'),
      s"alias must be [A-Za-z0-9_]+: '$alias'")
    registry.put(alias.toLowerCase, tableDir)
    ()
  }

  def unregister(alias: String): Unit = {
    registry.remove(alias.toLowerCase); ()
  }

  private[plans] def lookup(alias: String): Option[String] =
    Option(registry.get(alias.toLowerCase))

  /** Fast-path guard for the rule: with no registered alias the rule
    * must cost NOTHING — analyzer rules run on every plan of every
    * query (and every micro-batch of every stream), so an
    * unconditional tree walk would tax the whole engine for a feature
    * only SQL-text snapshot consumers use. */
  private[plans] def isEmpty: Boolean = registry.isEmpty

  /** Resolve a multipart identifier (with optional explicit version
    * from `VERSION AS OF`) to the snapshot read's analyzed plan. */
  private[plans] def resolve(spark: SparkSession, parts: Seq[String],
                             version: Option[Long]): Option[LogicalPlan] = {
    val alias = parts match {
      case Seq(ns, a) if ns.equalsIgnoreCase(Namespace) => Some(a)
      case Seq(a) if lookup(a).isDefined ||
        lookup(stripV(a)._1).isDefined => Some(a)
      case _ => None
    }
    alias.flatMap { a =>
      // a FULL-alias registration always wins: an alias that itself
      // ends in `__v<N>` (legal [A-Za-z0-9_]+) must stay reachable —
      // the suffix is only time-travel sugar when the literal alias
      // is not registered, never a reroute onto a different table
      val (name, suffixVer) =
        if (lookup(a).isDefined) (a, None) else stripV(a)
      lookup(name).map { dir =>
        Snapshots.read(spark, dir, version.orElse(suffixVer))
          .queryExecution.analyzed
      }
    }
  }

  /** `alias__v<N>` → (alias, Some(N)); anything else → (alias, None). */
  private def stripV(a: String): (String, Option[Long]) = {
    val i = a.lastIndexOf("__v")
    if (i > 0 && a.substring(i + 3).nonEmpty &&
        a.substring(i + 3).forall(_.isDigit))
      (a.substring(0, i), Some(a.substring(i + 3).toLong))
    else (a, None)
  }
}

/** The analyzer rule [[graft.GraftExtensions]] injects. Runs after
  * Spark's builtin resolution within the same batch, so it only ever
  * sees relations nothing else could resolve. */
class SnapshotRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SnapshotSql.isEmpty) plan
    else plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
          if v.forall(_.isDigit) =>
        SnapshotSql.resolve(spark, u.multipartIdentifier, Some(v.toLong))
          .getOrElse(tt)
      case u: UnresolvedRelation =>
        SnapshotSql.resolve(spark, u.multipartIdentifier, None).getOrElse(u)
    }
}
