package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the pairs-to-clusters step a
  * dedup pipeline needs after near-duplicate PAIR detection (TextDedup):
  * a duplicate "cluster" is a component of the pair graph, and the
  * canonical representative (keep-doc) is its minimum id.
  *
  * Algorithm: hash-min label propagation to a driver-orchestrated
  * fixpoint — every vertex starts labeled with its own id; each round,
  * labels flow across edges (both directions) and every vertex keeps the
  * minimum label seen. One round = one equi-join (edges x labels) + one
  * map-side-combining min aggregate; rounds needed = max component
  * diameter. Near-dup clusters are dense (diameter 1-3), so this
  * converges in 2-4 rounds; for high-diameter graphs (chains) prefer
  * star-contraction variants — this operator is tuned for the dedup
  * workload, and `maxIter` bounds the worst case.
  *
  * Scale notes: labels are O(V) and each round shuffles O(E + V) on the
  * vertex id — same profile as one GraphX Pregel superstep. Lineage is
  * cut per round ([[Cascade.Strategy]], reused) exactly like Cascade's
  * levels: without a cut, round k re-executes rounds 1..k-1. Convergence
  * is detected by the label-sum invariant: labels only ever decrease, so
  * the sum of labels is strictly decreasing until fixpoint (summed as
  * decimal(38,0) — no overflow at any V).
  */
object Components {

  /** @param edges     undirected edge list (each pair once is enough)
    * @param srcCol    edge endpoint column
    * @param dstCol    other endpoint column
    * @param vertices  optional full vertex frame — vertices with no edges
    *                  come back as singleton components; edge endpoints
    *                  are always included
    * @param idCol     vertex id column (in `vertices` and the output)
    * @param maxIter   round bound (>= max component diameter to converge)
    * @param strategy  per-round lineage cut, default [[Cascade.Auto]]
    *                   (reliable when a checkpoint dir is configured,
    *                   local otherwise — the cluster-correct default)
    * @return (idCol, component) — component = min vertex id reachable
    */
  def connected(
      edges: DataFrame, srcCol: String, dstCol: String,
      vertices: Option[DataFrame] = None, idCol: String = "id",
      maxIter: Int = 20,
      strategy: Cascade.Strategy = Cascade.Auto,
      requireConvergence: Boolean = true): DataFrame = {

    def cut(df: DataFrame): DataFrame = Cascade.cut(df, strategy, eager = true)

    // cut the edge frame ONCE: every round joins against it, and without
    // a cut each round re-executes the full upstream edge derivation
    // (e.g. the inverted-index Jaccard scan behind near-dup pairs) —
    // measured 9.7s -> 3.4s on d9 at sf0.1
    val bi = cut(
      edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
        .unionByName(edges.select(col(dstCol).as("_src"), col(srcCol).as("_dst"))))
    val endpointIds = bi.select(col("_src").as(idCol))
    val vertexIds = vertices
      .map(_.select(col(idCol)).unionByName(endpointIds))
      .getOrElse(endpointIds)
      .distinct()

    var labels = cut(vertexIds.select(col(idCol), col(idCol).as("component")))
    var labelSum = checksum(labels)
    var it = 0
    var converged = false
    // maxIter bounds the label-PROPAGATION rounds; convergence is only
    // OBSERVED by a round whose checksum doesn't move, so allow one extra
    // confirmation round — otherwise a graph whose diameter equals
    // maxIter exactly would finalize its labels on the last round and
    // still be reported unconverged ("maxIter >= diameter" must suffice)
    while (!converged && it <= maxIter) {
      val msgs = bi
        .join(labels.withColumnRenamed(idCol, "_src"), Seq("_src"))
        .select(col("_dst").as(idCol), col("component"))
      val next = cut(
        labels.unionByName(msgs)
          .groupBy(col(idCol)).agg(min(col("component")).as("component")))
      val nextSum = checksum(next)
      converged = nextSum == labelSum
      labels = next
      labelSum = nextSum
      it += 1
    }
    // a graph whose diameter exceeds maxIter exits the loop with labels
    // that still split one component into several ids — corrupt clusters,
    // not a slow answer. Fail loudly (or warn, for callers that accept a
    // refinement of the true components) instead of returning them as fact.
    if (!converged) {
      val msg = s"Components.connected did not converge within maxIter=$maxIter " +
        s"rounds (graph diameter exceeds the bound); labels are NOT final components"
      if (requireConvergence) throw new IllegalStateException(msg)
      else System.err.println(s"WARN $msg")
    }
    labels
  }

  /** Representative selection — the "which copy do we keep" act on top of
    * [[connected]]'s clusters: join the labeled vertices back to their
    * attribute frame and keep, per component, the row winning the
    * caller's preference order (e.g. longest text first, id as the
    * deterministic tiebreak — ALWAYS end `order` with a per-vertex-unique
    * column or reps are nondeterministic under retries).
    *
    * Shape: one equi-join labels⋈attrs (labels are a projection of attrs'
    * id space — co-partitioned after the component aggregate) + ONE
    * component-keyed window. Per-cluster row counts bound the window
    * partitions, so skew is capped by the largest duplicate cluster, not
    * the corpus.
    *
    * @return one row per component: (component, rep under `idCol`'s name
    *         prefixed `rep_`, n_members)
    */
  def representatives(
      labels: DataFrame, attrs: DataFrame, idCol: String,
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(order.nonEmpty, "representatives: preference order required")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("component")).orderBy(order: _*)
    // unordered spec = whole-partition frame: the member count shares the
    // same component-keyed shuffle as the rank, no second exchange
    val wAll = Window.partitionBy(col("component"))
    labels.join(attrs, Seq(idCol))
      .select(col("component"), col(idCol),
        row_number().over(w).as("_rn"),
        count(lit(1)).over(wAll).as("n_members"))
      .filter(col("_rn") === 1)
      .select(col("component"), col(idCol).as(s"rep_$idCol"),
        col("n_members"))
  }

  private def checksum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("component").cast("decimal(38,0)"))).head()
      .getDecimal(0) match {
        case null => java.math.BigDecimal.ZERO
        case d => d
      }
}
