package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): find records that describe the same
  * real-world entity despite dirty attributes, group them, and survive a
  * golden record per entity — the classic master-data workload the
  * reference's A1/A3 exact-key dedup cannot express (it needs IDENTICAL
  * stringified rows; here the rows differ and similarity decides).
  *
  * Shape, in the d6/d9 discipline:
  *  1. [[candidates]] — BLOCKING: records meet only inside bounded blocks
  *     (an equi-join on a deterministic block key — never an n² product).
  *     `maxBlock` is the skew dial: blocks larger than the cap are
  *     dropped before the self-join (the standard blocking-key skew
  *     guard — an over-merged key like a blank name would otherwise
  *     square; same discipline as [[TextDedup]]'s `maxDf`). Pair cost is
  *     Σ min(|block|, cap)² — linear in the corpus for bounded blocks.
  *  2. [[matchPairs]] — candidates scored by normalized Levenshtein
  *     similarity of the chosen attribute (codegen'd `levenshtein`, no
  *     UDF), kept at `sim_bp ≥ minSimBp`. Basis points + floor keep the
  *     threshold engine-portable (no float formatting at the boundary).
  *  3. [[resolve]] — matched pairs close transitively into entities via
  *     [[graft.ops.Components.connected]] (hash-min fixpoint, per-round
  *     lineage cuts); every record gets `entity_id` = min record id of
  *     its component (singletons resolve to themselves).
  *  4. golden record = [[graft.ops.Components.representatives]] over the
  *     resolved labels with a caller preference order (e.g. longest —
  *     least-damaged — name first, id tiebreak).
  *
  * At 100 TB: blocking is one shuffle on the block key; component
  * fixpoint rounds are bounded by cluster diameter (entity clusters are
  * small — bounded by per-entity record multiplicity, not corpus size);
  * representatives is one component-keyed window. Nothing driver-side.
  */
object EntityResolution {

  /** Candidate pairs `(id_a, id_b)`, `id_a < id_b`, from records sharing
    * a block key. `block` must be a deterministic projection of the
    * record (null block keys never pair). `maxBlock` drops oversize
    * blocks entirely — the skew guard; pairs inside a dropped block are
    * NOT emitted (callers wanting those must supply a finer key). */
  def candidates(
      records: DataFrame, id: String, block: Column,
      maxBlock: Option[Int] = None): DataFrame = {
    val keyed = records.select(block.as("_bk"), col(id))
      .filter(col("_bk").isNotNull)
    val kept = maxBlock match {
      case Some(m) =>
        // anti-join the FEW oversize keys (bounded by n/cap) so the
        // record stream takes a broadcast probe, not a full shuffle
        val big = keyed.groupBy("_bk").agg(count(lit(1)).as("_c"))
          .filter(col("_c") > m).select("_bk")
        keyed.join(big, Seq("_bk"), "left_anti")
      case None => keyed
    }
    kept.select(col("_bk"), col(id).as("id_a"))
      .join(kept.select(col("_bk"), col(id).as("id_b")), Seq("_bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** Candidate pairs touching a NEW subset: pairs within a block where
    * at least one endpoint satisfies `isNew`, each unordered pair
    * exactly once (`id_a < id_b`) — the incremental-linkage probe shape
    * (a micro-batch of arrivals matched against the registry AND itself
    * without re-pairing the registry against itself; the same
    * exactly-once filter as [[TextDedup.anchoredJaccardPairs]]).
    * A record's block key must not change across deliveries. */
  def candidatesTouching(
      records: DataFrame, id: String, block: Column, isNew: Column,
      maxBlock: Option[Int] = None): DataFrame = {
    val keyed = records.select(block.as("_bk"), col(id), isNew.as("_new"))
      .filter(col("_bk").isNotNull)
    val kept = maxBlock match {
      case Some(m) =>
        val big = keyed.groupBy("_bk").agg(count(lit(1)).as("_c"))
          .filter(col("_c") > m).select("_bk")
        keyed.join(big, Seq("_bk"), "left_anti")
      case None => keyed
    }
    val newSide = kept.filter(col("_new"))
      .select(col("_bk"), col(id).as("_ida"))
    // a<b keeps a both-new pair once in canonical order; a>b survives
    // only against an OLD b (the mirrored both-new row cannot double-
    // count, while a new record still reaches its smaller old neighbours)
    newSide
      .join(kept.select(col("_bk"), col(id).as("_idb"), col("_new")), Seq("_bk"))
      .filter(col("_ida") < col("_idb") ||
        (col("_ida") > col("_idb") && !col("_new")))
      .select(least(col("_ida"), col("_idb")).as("id_a"),
        greatest(col("_ida"), col("_idb")).as("id_b"))
  }

  /** Sorted-neighborhood candidates (Hernández & Stolfo 1995 SNM):
    * records globally ranked by a prepared sort key
    * ([[graft.ops.Zip.globalRank]] — range partition + per-partition
    * offsets, never a single-task global sort); each record pairs with
    * its `window − 1` successors via an EQUI-join on position (every
    * record probes the ranks behind it), so per-record fan-out is
    * bounded by the window regardless of key-collision skew — the
    * complementary failure mode to key [[candidates]] blocking, which
    * collapses when many records share a block. Pairs come out
    * canonical (`id_a < id_b`), each exactly once (ranks are unique). */
  def sortedNeighborhoodCandidates(
      records: DataFrame, id: String, sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 2, s"sorted-neighborhood window must be >= 2, got $window")
    val ranked = graft.ops.Zip.globalRank(
      records.select(col(id), sortKey.as("__sk")),
      Seq(col("__sk"), col(id)))
      .select(col(id), col("rn"))
    val probes = ranked.select(col(id).as("_idl"),
      explode(sequence(col("rn") + 1, col("rn") + (window - 1))).as("rn"))
    probes.join(ranked.select(col(id).as("_idr"), col("rn")), Seq("rn"))
      .select(least(col("_idl"), col("_idr")).as("id_a"),
        greatest(col("_idl"), col("_idr")).as("id_b"))
  }

  /** Score a candidate pair frame `(id_a, id_b)` by normalized
    * Levenshtein similarity of `attr` —
    * `sim_bp = ⌊10⁴·(1 − lev(a,b)/max(|a|,|b|))⌋` — kept at
    * `sim_bp ≥ minSimBp`. Identical strings score 10⁴; the floor-to-bp
    * boundary is exact integer arithmetic on both engines. Attribute
    * values re-attach to the (small) candidate pair set by id equi-join,
    * so the corpus shuffles its (id, attr) projection, never whole rows. */
  def scorePairs(
      records: DataFrame, id: String, attr: String, cand: DataFrame,
      minSimBp: Int): DataFrame = {
    val vals = records.select(col(id), col(attr).as("_v"))
    val la = length(col("_va"))
    val lb = length(col("_vb"))
    cand
      .join(vals.select(col(id).as("id_a"), col("_v").as("_va")), Seq("id_a"))
      .join(vals.select(col(id).as("id_b"), col("_v").as("_vb")), Seq("id_b"))
      // null/empty attributes carry no string-similarity evidence and
      // are EXCLUDED from matching (deliberate, and distinct from
      // [[fellegiSunter]], where null<=>null counts as field agreement
      // under the probabilistic model): a null value or a 0/0 division
      // on two empties would otherwise yield a null sim_bp the
      // threshold filter drops SILENTLY — make the exclusion explicit
      .filter(col("_va").isNotNull && col("_vb").isNotNull &&
        greatest(la, lb) > 0)
      .withColumn("sim_bp",
        floor(lit(10000) * (lit(1.0) -
          levenshtein(col("_va"), col("_vb")).cast("double") /
            greatest(la, lb).cast("double"))).cast("long"))
      .filter(col("sim_bp") >= minSimBp)
      .select(col("id_a"), col("id_b"), col("sim_bp"))
  }

  /** Fellegi–Sunter probabilistic linkage (JASA 1969 — the canonical
    * record-linkage decision model behind Splink/febrl): each candidate
    * pair accumulates per-field log-likelihood-ratio weights
    * `ln(m/u)` on agreement and `ln((1−m)/(1−u))` on disagreement, and
    * the summed weight classifies the pair match / possible (clerical
    * review) / nonmatch against two thresholds.
    *
    * Probability sources: the u's (P(agree | non-match)) for EXACT
    * agreement are DATA-DERIVED — `u = Σ_v count(v)² / n²`, the chance
    * two random records agree on the field — from one tiny per-field
    * aggregate each; the m's (P(agree | true match)) and the NEAR-level
    * u are conventioned parameters, as in practice (m's come from EM or
    * convention; this engine parameterizes them). The name field gets
    * THREE outcomes (exact / near by normalized-Levenshtein ≥ nearSimBp
    * / disagree), exact fields two.
    *
    * Determinism: every weight is computed ONCE (driver) as
    * `round(ln(m/u)·10⁶)` from exact-integer-derived doubles and enters
    * the plan as a LITERAL; pair scoring is integer sums of literals —
    * partition- and engine-independent (the t18 fixed-point discipline).
    * Shape: one count + one Σcount² aggregate per field (tiny,
    * map-side-combinable), then the candidate-pair equi-joins of
    * [[scorePairs]]. Output: (id_a, id_b, fs_micro, verdict). */
  def fellegiSunter(records: DataFrame, id: String, cand: DataFrame,
                    nameAttr: String, exactAttrs: Seq[String],
                    mNameExact: Double = 0.70, mNameNear: Double = 0.25,
                    uNameNear: Double = 0.02, nearSimBp: Int = 8000,
                    mExact: Double = 0.95,
                    matchMicro: Long = 8000000L,
                    possibleMicro: Long = 0L): DataFrame = {
    val n = records.count()
    require(n > 0, "empty record table")
    def uOf(attr: String): Double = {
      val num = records.groupBy(col(attr)).agg(count(lit(1)).as("_c"))
        .agg(sum(col("_c") * col("_c"))).head().getLong(0)
      num.toDouble / (n * n).toDouble
    }
    // every ln argument must be strictly positive or a weight silently
    // becomes NaN (math.round maps NaN to 0, corrupting every verdict
    // with no error): the m's must leave positive disagreement mass,
    // and the DATA-DERIVED u's can be arbitrarily large on a
    // low-cardinality field — fail fast naming the offender instead
    def w(m: Double, u: Double, what: String): Long = {
      require(m > 0 && m < 1, s"fellegiSunter: $what m=$m outside (0,1)")
      require(u > 0 && u < 1, s"fellegiSunter: $what u=$u outside (0,1) " +
        "(data-derived u ~ 1 means the field is near-constant — drop it)")
      math.round(math.log(m / u) * 1e6)
    }
    val uName = uOf(nameAttr)
    val wNameExact = w(mNameExact, uName, s"name '$nameAttr' exact")
    val wNameNear = w(mNameNear, uNameNear, s"name '$nameAttr' near")
    val wNameDis = w(1.0 - mNameExact - mNameNear, 1.0 - uName - uNameNear,
      s"name '$nameAttr' disagree")
    val exactW: Seq[(String, Long, Long)] = exactAttrs.map { a =>
      val u = uOf(a)
      (a, w(mExact, u, s"'$a' agree"), w(1.0 - mExact, 1.0 - u, s"'$a' disagree"))
    }
    val attrs = nameAttr +: exactAttrs
    val vals = records.select(col(id) +: attrs.map(col): _*)
    val joined = cand
      .join(vals.select(col(id).as("id_a") +:
        attrs.map(a => col(a).as(s"_a_$a")): _*), Seq("id_a"))
      .join(vals.select(col(id).as("id_b") +:
        attrs.map(a => col(a).as(s"_b_$a")): _*), Seq("id_b"))
    val na = col(s"_a_$nameAttr"); val nb = col(s"_b_$nameAttr")
    val simBp = floor(lit(10000) * (lit(1.0) -
      levenshtein(na, nb).cast("double") /
        greatest(length(na), length(nb)).cast("double"))).cast("long")
    val nameTerm = when(na <=> nb, lit(wNameExact))
      .when(simBp >= nearSimBp, lit(wNameNear))
      .otherwise(lit(wNameDis))
    val fs = exactW.foldLeft(nameTerm) { case (acc, (a, wa, wd)) =>
      acc + when(col(s"_a_$a") <=> col(s"_b_$a"), lit(wa)).otherwise(lit(wd))
    }
    joined
      .withColumn("fs_micro", fs)
      .select(col("id_a"), col("id_b"), col("fs_micro"),
        when(col("fs_micro") >= matchMicro, lit("match"))
          .when(col("fs_micro") >= possibleMicro, lit("possible"))
          .otherwise(lit("nonmatch")).as("verdict"))
  }

  /** Matched record pairs: block [[candidates]] scored by
    * [[scorePairs]]. */
  def matchPairs(
      records: DataFrame, id: String, attr: String, block: Column,
      minSimBp: Int, maxBlock: Option[Int] = None): DataFrame =
    scorePairs(records, id, attr, candidates(records, id, block, maxBlock),
      minSimBp)

  /** Entity assignment: transitive closure of the matched pairs over ALL
    * records — `(id, entity_id)` with `entity_id` = min record id in the
    * connected component; unmatched records are their own entity.
    *
    * `algo`: dense dup clusters (diameter 1-3) take the default
    * hash-min; er4-style sorted-neighborhood pairs can chain into PATH
    * graphs whose diameter exceeds hash-min's round bound — pass
    * [[graft.ops.Components.StarContraction]] there (O(log² V) rounds
    * at any diameter; spec-pinned label-equal to hash-min). */
  def resolve(
      records: DataFrame, id: String, pairs: DataFrame,
      strategy: graft.ops.Cascade.Strategy = graft.ops.Cascade.Auto,
      algo: graft.ops.Components.Algo = graft.ops.Components.HashMin): DataFrame =
    graft.ops.Components.connected(
        pairs, "id_a", "id_b",
        vertices = Some(records.select(col(id))), idCol = id,
        strategy = strategy, algo = algo)
      .select(col(id), col("component").as("entity_id"))
}
