package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Ids

/** v1.2-equivalent multi-sheet wiring (SURVEY.md §3.3,
  * cds-transformation_v1.2.py:92-200): typed sheets arrive as separate
  * frames and FK columns are wired explicitly —
  *
  *  - J3 lookup join, FIRST match, with the reference's all-or-nothing
  *    rule (`:168-194`): the joined column is kept only when EVERY row
  *    found a match; one miss and the whole column is dropped.
  *  - J4 broadcast scalar (`:161-166`): when the Study sheet has exactly
  *    one row with a non-null key, replicate it onto every child row.
  *  - P10 id fallback (`:66-73`): missing file ids are synthesized — the
  *    reference draws random ints; we derive a deterministic sha2
  *    surrogate from the natural columns (SURVEY.md §7.4 risk 4).
  *
  * Spark shapes: J3 = aggregate-then-broadcast-join (`min_by` for a
  * deterministic "first"), never a per-row scan; the all-or-nothing probe
  * is one small count aggregate. J4 = driver `collect()` of a 1-row frame
  * into a literal. All decisions that gate SCHEMA (keep/drop a column)
  * are driver-side by necessity, same as the reference.
  */
object MultiSheet {

  /** J3: `child` gains `outCol` = first `valueCol` from `mapping` matching
    * on `key` (first = minimal `orderCol`, deterministic). Returns the
    * child UNCHANGED when any child row would miss (all-or-nothing). */
  def lookupFirstMatch(
      child: DataFrame, key: String,
      mapping: DataFrame, valueCol: String, orderCol: String,
      outCol: String): DataFrame = {
    val firsts = mapping
      .filter(graft.ColNames.q(key).isNotNull && graft.ColNames.q(valueCol).isNotNull)
      .groupBy(graft.ColNames.q(key))
      .agg(min_by(graft.ColNames.q(valueCol), graft.ColNames.q(orderCol)).as(outCol))
    val joined = child.join(broadcast(firsts), Seq(key), "left")
    val misses = joined.filter(graft.ColNames.q(outCol).isNull).limit(1).count()
    if (misses > 0) child else joined
  }

  /** J4: replicate the single parent row's `keyCol` onto every child row
    * as `outCol`; no-op when the parent isn't exactly one non-null row. */
  def broadcastScalar(
      child: DataFrame, parent: DataFrame, keyCol: String, outCol: String): DataFrame = {
    val rows = parent.select(graft.ColNames.q(keyCol)).limit(2).collect()
    rows match {
      case Array(r) if !r.isNullAt(0) =>
        child.withColumn(outCol, lit(r.get(0)))
      case _ => child
    }
  }

  /** P10: fill a missing-or-null id column with a deterministic surrogate
    * derived from `naturalCols`. Adds the column when absent. */
  def ensureId(df: DataFrame, idCol: String, naturalCols: Seq[String]): DataFrame = {
    val surrogate = Ids.deterministicId(naturalCols.map(graft.ColNames.q))
    if (!df.columns.contains(idCol)) df.withColumn(idCol, surrogate)
    else df.withColumn(idCol, coalesce(graft.ColNames.q(idCol), surrogate))
  }

  /** J3 lenient variant: first-match lookup column kept even when some
    * rows miss (nulls survive). The v1.2 FILE leg needs this — its keep
    * decision is gated on the SAMPLE leg's completeness, not its own
    * (cds-transformation_v1.2.py:194 tests `participant_id_list`, the
    * sample loop's list, before assigning `file['sample.sample_id']` —
    * so a fully-gated file leg ships its misses as nulls). */
  def lookupFirstMatchLenient(
      child: DataFrame, key: String,
      mapping: DataFrame, valueCol: String, orderCol: String,
      outCol: String): DataFrame = {
    val firsts = mapping
      .filter(graft.ColNames.q(key).isNotNull && graft.ColNames.q(valueCol).isNotNull)
      .groupBy(graft.ColNames.q(key))
      .agg(min_by(graft.ColNames.q(valueCol), graft.ColNames.q(orderCol)).as(outCol))
    child.join(broadcast(firsts), Seq(key), "left")
  }

  /** One sheet of the v1.2 workbook: which node it extracts to, under
    * which COLUMN-keyed mapping (`raw column -> property`). */
  final case class SheetSpec(node: String, sheet: String, mapping: Map[String, String])

  /** The v1.2 script's HARD-CODED node→sheet binding
    * (cds-transformation_v1.2.py:102-131: six `pd.read_excel` calls with
    * literal sheet names, each feeding one `extract_data(node, ...)`).
    * The mapping sheet ("File-Participant-Sample Mapping", `:123-126`)
    * is not a node sheet — [[transform]] takes it via `fpsSheet`. */
  val V12SheetForNode: Map[String, String] = Map(
    "participant" -> "Participant",
    "sample" -> "Sample",
    "file" -> "File",
    "genomic_info" -> "Genomic Info",
    "study" -> "Study",
    "diagnosis" -> "Diagnosis (opt)")

  /** Flat scalar config keys of a v1/v1.2/v1.3 pipeline config
    * (`cds_config_example_v1.2.yaml`: NODE_FILE, DATA_FOLDER,
    * RAW_DATA_DICTIONARY, CLEAN_DICT, MODEL_FILE_PROPS, DATA_BATCH_NAME,
    * RATIO_LIMIT, S3_BUCKET, OUTPUT_FOLDER...). List/map-valued keys are
    * skipped — they belong to the v1.3 [[Pipeline.specsFromYaml]] shapes. */
  def parseFlatConfig(configYaml: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    new org.yaml.snakeyaml.Yaml().load[Any](configYaml) match {
      case m: java.util.Map[_, _] =>
        m.asScala.collect {
          case (k, v) if v != null &&
              !v.isInstanceOf[java.util.Map[_, _]] &&
              !v.isInstanceOf[java.util.List[_]] =>
            k.toString -> v.toString
        }.toMap
      case _ => Map.empty
    }
  }

  /** v17 — build the v1.2 pipeline's specs from the reference's REAL
    * config artifacts, unedited (the r14 VERDICT's v16-for-v1.2 demand):
    * the flat `cds_config_example_v1.2.yaml` names the raw dict, the
    * model props, and the clean dict; this resolves each through `slurp`
    * (the caller anchors relative `./`-paths at the checkout root) and
    * derives exactly what `cds-transformation_v1.2.py` derives —
    *
    *  - [[SheetSpec]]s: one per raw-dict node under [[V12SheetForNode]]
    *    (`extract_data` consumes `raw_dict[node]` column-keyed, `:52-77`);
    *  - [[CleanSpec]]: enum vocabularies and integer props from
    *    MODEL_FILE_PROPS' PropDefinitions, dirty→canonical maps +
    *    nan_value fills + extra_long_values from CLEAN_DICT — the shared
    *    `clean_data` (cds_transformation_functions.py:10-76) keys its
    *    enum branch on the props file and its lookup on the clean dict,
    *    identically for v1.2 and v1.3.
    *
    * NODE_FILE is deliberately NOT read: the v1.2 transform branch loads
    * it (`:141-142`) but never uses it (only the
    * `--extract_raw_data_dictionary` mode does, `:244-255`) — and the
    * example config's `cds-model-wprog.yml` is absent from the public
    * checkout, so faithfully skipping it is also what makes the real
    * config runnable as-is.
    *
    * Returns (specs, clean, flat config) — the config rides along so
    * callers can reach DATA_FOLDER/DATA_BATCH_NAME/OUTPUT_FOLDER for
    * staging the same way the reference's glob loop does (`:88`). */
  def specsFromV12Yaml(configYaml: String, slurp: String => String)
      : (Seq[SheetSpec], CleanSpec, Map[String, String]) = {
    import graft.model.ModelLoader
    val cfg = parseFlatConfig(configYaml)
    def req(key: String): String = cfg.getOrElse(key,
      sys.error(s"v1.2 config is missing required key $key"))
    val rawDict = ModelLoader.parseRawDict(slurp(req("RAW_DATA_DICTIONARY")))
    val props = ModelLoader.parsePropDefs(slurp(req("MODEL_FILE_PROPS")))
    val cleanFull = ModelLoader.parseCleanDictFull(slurp(req("CLEAN_DICT")))
    val specs = rawDict.toSeq.sortBy(_._1).flatMap { case (node, cols) =>
      V12SheetForNode.get(node).map(sheet =>
        SheetSpec(node, sheet, cols.toMap))
    }
    val clean = CleanSpec(
      cleanDict = cleanFull.mappings,
      enums = props.collect {
        case (p, d) if d.enum.nonEmpty => p -> d.enum },
      nanValues = cleanFull.nanValues,
      extraLongValues = cleanFull.extraLongValues,
      intProps = props.collect {
        case (p, d) if d.spark == org.apache.spark.sql.types.LongType => p
      }.toSeq.sorted)
    (specs, clean, cfg)
  }

  /** P5/P6 configuration for the v1.2 clean stage (`clean_data` over the
    * multi-sheet frames, cds-transformation_v1.2.py:196). */
  final case class CleanSpec(
      cleanDict: Map[String, Map[String, Option[String]]] = Map.empty,
      enums: Map[String, Seq[String]] = Map.empty,
      nanValues: Map[String, String] = Map.empty,
      extraLongValues: Seq[String] = Nil,
      intProps: Seq[String] = Nil)

  /** v1.2 end-to-end orchestration (`cds-transformation_v1.2.py:133-196`):
    * 7 typed sheets in, one cleaned frame per node out.
    *
    * Faithful stage order:
    *  1. blanks→null on every sheet (`:133-139`; v1.2 does NOT trim);
    *  2. per-sheet column-keyed extract ([[graft.mapping.RawDict
    *     .extractByColumn]], `:52-77`) with the file_id fallback chain
    *     (`:66-73`): a GUID/guid column in the RAW sheet projects
    *     same-row; absent both, a DETERMINISTIC sha2 surrogate over the
    *     extracted columns replaces the reference's random draw
    *     (SURVEY.md §7.4 risk 4);
    *  3. diagnosis parent pointer (`:158-160`): the raw sheet's
    *     `participant_id`, same-row (wide projection, never a join);
    *  4. J4 broadcast scalar (`:161-166`): single-row study with non-null
    *     `phs_accession` replicates onto participant — guarded on a
    *     non-empty participant extract;
    *  5. J3 lookup joins off the mapping sheet (`:168-194`): the SAMPLE
    *     leg is all-or-nothing on its own misses; the FILE leg runs under
    *     gate B but keeps its column (misses as nulls) iff the SAMPLE
    *     leg was complete — the reference's `:194` condition tests the
    *     sample loop's list. When gate A never ran the sample loop the
    *     reference raises NameError; this engine skips the file leg
    *     (the one deliberate divergence — a crash is not a semantics);
    *  6. P5/P6 clean per extracted column (`:196`).
    *
    * `fpsOrder` names the column of the mapping sheet that carries its
    * original row order — "first match" is a sheet-order `iloc[0]`, so
    * the caller must stage an explicit order (the xlsx source preserves
    * row order; add a row index at staging). All schema-gating decisions
    * (keep/drop a column, run/skip a leg) are driver-side by necessity,
    * exactly as in the reference. */
  def transform(
      sheets: Map[String, DataFrame],
      specs: Seq[SheetSpec],
      clean: CleanSpec = CleanSpec(),
      fpsSheet: String = "File-Participant-Sample Mapping",
      fpsOrder: String = "row_order"): Map[String, DataFrame] = {
    import graft.mapping.RawDict
    import graft.ops.Normalize

    val norm = sheets.map { case (k, v) => k -> Normalize.blanksToNull(v) }

    def hasColumn(sheet: String, c: String): Boolean =
      norm.get(sheet).exists(_.columns.contains(c))

    // 2. extract (with the file_id fallback folded into the projection —
    // a GUID column must attach same-row, so it rides the extract select).
    // The "does the file node need a surrogate id" emptiness probe is
    // DEFERRED into the fused probe pass below (one driver action for
    // every schema gate instead of one job each).
    var nodes: Map[String, DataFrame] = specs.map { spec =>
      val sheet = norm(spec.sheet)
      val mapping =
        if (spec.node == "file" &&
            !sheet.columns.exists(c => spec.mapping.get(c).contains("file_id")))
          Seq("GUID", "guid").find(sheet.columns.contains) match {
            case Some(g) => spec.mapping + (g -> "file_id")
            case None => spec.mapping
          }
        else spec.mapping
      spec.node -> RawDict.extractByColumn(sheet, mapping, spec.node)
    }.toMap

    // ONE fused probe action (round-20, guide §7 driver-side costs):
    // the independent data probes gating schema decisions — file-node
    // emptiness (surrogate-id fallback), diagnosis pointer liveness and
    // emptiness, participant emptiness, study key null-freedom — used
    // to run one driver job EACH (limit(1)/agg per frame). They share
    // no data, so a union of 1-row aggregate legs answers all of them
    // in a single collect; decisions and decision ORDER are unchanged.
    // Legs that an && chain would have short-circuited away now always
    // compute — pure bounded reads, same results where consulted.
    val probeLegs = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
    def emptinessLeg(df: DataFrame): DataFrame =
      df.limit(1).select(lit(1L).as("__one"))
        .agg(count(lit(1)).as("n"), count(lit(1)).as("nn"))
    val fileNeedsId =
      nodes.contains("file") && !nodes("file").columns.contains("file_id")
    if (fileNeedsId)
      probeLegs += "file_empty" -> emptinessLeg(nodes("file"))
    for (spec <- specs.find(_.node == "diagnosis")) {
      val sheet = norm(spec.sheet)
      if (sheet.columns.contains("participant_id")) {
        probeLegs += "diag_pid" -> sheet.agg(count(lit(1)).as("n"),
          count(graft.ColNames.q("participant_id")).as("nn"))
        probeLegs += "diag_empty" -> emptinessLeg(nodes("diagnosis"))
      }
    }
    val j4Shape = nodes.get("study").exists(_.columns.contains("phs_accession")) &&
      nodes.contains("participant")
    if (j4Shape) {
      probeLegs += "part_empty" -> emptinessLeg(nodes("participant"))
      probeLegs += "study_phs" -> nodes("study").agg(count(lit(1)).as("n"),
        count(graft.ColNames.q("phs_accession")).as("nn"))
    }
    val probes: Map[String, (Long, Long)] =
      if (probeLegs.isEmpty) Map.empty
      else probeLegs.map { case (tag, leg) =>
          leg.select(lit(tag).as("tag"), col("n"), col("nn"))
        }.reduce(_.union(_))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def nonEmpty(tag: String): Boolean = probes(tag)._1 > 0L

    if (fileNeedsId && nonEmpty("file_empty"))
      nodes += "file" -> ensureId(nodes("file"), "file_id",
        nodes("file").columns.filter(_ != "type").sorted.toSeq)

    // 3. diagnosis parent pointer — same-row from the raw sheet
    for (spec <- specs.find(_.node == "diagnosis")) {
      val sheet = norm(spec.sheet)
      if (sheet.columns.contains("participant_id") &&
          probes("diag_pid")._2 > 0L && nonEmpty("diag_empty"))
        nodes += "diagnosis" -> RawDict.extractByColumn(sheet,
          spec.mapping + ("participant_id" -> "participant.participant_id"),
          "diagnosis")
    }

    // 4. J4 broadcast scalar study -> participant
    if (j4Shape && nonEmpty("part_empty") &&
        probes("study_phs")._1 == probes("study_phs")._2)
      nodes += "participant" -> broadcastScalar(
        nodes("participant"), nodes("study"), "phs_accession", "study.phs_accession")

    // 5. J3 legs off the mapping sheet. The sheet feeds up to 4 null
    // probes and both legs' first-match aggregates, so persist it for the
    // section (a mapping sheet is workbook-sized) and fold every gate
    // probe into ONE aggregate pass.
    norm.get(fpsSheet).foreach { fps0 =>
      val fps = fps0.persist()
      try {
        val gateCols = Seq("sample_id", "participant_id", "file_id")
          .filter(fps.columns.contains)
        val noNulls: Map[String, Boolean] =
          if (gateCols.isEmpty) Map.empty
          else {
            val aggs = count(lit(1)).as("__n") +:
              gateCols.map(c => count(graft.ColNames.q(c)).as(c))
            val r = fps.agg(aggs.head, aggs.tail: _*).first()
            val n = r.getAs[Long]("__n")
            gateCols.map(c => c -> (r.getAs[Long](c) == n)).toMap
          }
        def gate(cs: String*) = cs.forall(c => noNulls.getOrElse(c, false))
        var sampleComplete = false
        if (gate("sample_id", "participant_id") && nodes.contains("sample")) {
          val before = nodes("sample")
          val after = lookupFirstMatch(before, "sample_id", fps,
            "participant_id", fpsOrder, "participant.participant_id")
          sampleComplete = after.columns.contains("participant.participant_id")
          nodes += "sample" -> after
        }
        if (gate("file_id", "sample_id") && sampleComplete && nodes.contains("file"))
          nodes += "file" -> lookupFirstMatchLenient(nodes("file"), "file_id",
            fps, "sample_id", fpsOrder, "sample.sample_id")
      } finally {
        // the probe + the sample leg's misses count (the repeated scans)
        // ran under the persist; the file leg's lazy join recomputes the
        // sheet once at the caller's terminal action — an unpersisted
        // lineage is always safe, and nothing stays pinned behind us
        fps.unpersist()
        ()
      }
    }

    // 6. clean (P5 enum normalize where cleanable, P6 lossless int)
    nodes.map { case (name, df) =>
      val cols = df.columns.toSeq.map { c =>
        if (clean.enums.contains(c) && Normalize.enumCleanable(clean.enums(c)))
          Normalize.cleanValues(graft.ColNames.q(c),
            clean.cleanDict.getOrElse(c, Map.empty), clean.enums(c),
            clean.nanValues.get(c), clean.extraLongValues).as(c)
        else if (clean.intProps.contains(c))
          Normalize.losslessInt(graft.ColNames.q(c)).as(c)
        else graft.ColNames.q(c)
      }
      name -> df.select(cols: _*)
    }
  }
}
