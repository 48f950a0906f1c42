package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** v1 (primordial) pipeline orchestration — the reference's FIRST entry
  * point (`cds-transformation.py`), predating the dict/config-driven v1.2+
  * paths: per model node, properties are scraped off an ORDERED list of
  * workbook sheets by fuzzy column-name match and accumulated into the
  * node frame by "join if a shared property exists, else positional
  * concat", followed by a hardcoded add-properties table and hardcoded
  * node removals.
  *
  * Semantics preserved from the reference (file:line):
  *  - extract (`:11-27`): a sheet column matches a property when the
  *    normalized name (spaces→underscores, lowercased) is a substring of
  *    the property or vice versa; the LAST matching (sheet, column) in
  *    sheet order wins (later assignments overwrite). The FIRST matching
  *    sheet anchors the row set; other sheets' columns align by row
  *    position (pandas index alignment → left join on the row index).
  *  - accumulate (`:20-27`): if any extracted property already exists in
  *    the node frame, LEFT-join the new columns on the first such
  *    property; otherwise concat positionally with NaN-padding (full
  *    outer join on the row index).
  *  - add_properties (`:31-58`): per (node, source-sheet) rules add one
  *    column each; join-or-concat again, but the concat branch TRUNCATES
  *    the new columns to the frame's length (left join on row index) and
  *    the join branch dedups.
  *  - remove_node (`:60-68`): diagnosis and participant are cleared —
  *    participant is then re-extracted from the Participant sheet alone
  *    (`:133`).
  *  - study cleanup (`:146-148`): hardcoded column drops + dedup.
  *
  * Scale note: row-position alignment is inherently sequential (see
  * [[graft.ops.Zip]]); v1 frames are single-workbook-sized, and every
  * alignment here is an equi-join on a precomputed row-index column the
  * CALLER supplies per sheet (`rowIdx`) — no global windows inside the
  * loop. Join strategy is left to AQE: at workbook scale every side is
  * broadcast-sized and AQE broadcasts it; a forced hint would instead
  * push oversized sides through the driver when the fixture is scaled
  * up. Data-scale pipelines use the v1.3 [[Pipeline]] path instead.
  */
object Primordial {

  /** One add_properties rule: on `node`, add `newProperty` from
    * `sourceCol` of sheet `source` (`cds-transformation.py:32-41`). */
  final case class AddProp(node: String, newProperty: String,
                           sourceCol: String, source: String)

  /** The reference's hardcoded table (`cds-transformation.py:32-41`). */
  val defaultAddProps: Seq[AddProp] = Seq(
    AddProp("file", "acl", "acl", "CDS_Manifest"),
    AddProp("file", "file_id", "GUID", "CDS_Manifest"),
    AddProp("file", "sample.sample_id", "sample_id", "CDS_Manifest"),
    AddProp("genomic_info", "library_id", "library_id", "CDS_Manifest"),
    AddProp("genomic_info", "file.file_id", "GUID", "CDS_Manifest"),
    AddProp("sample", "sample_id", "Sample ID", "CGC_CDS_Explorer"),
    AddProp("sample", "participant.participant_id", "Participant ID", "CGC_CDS_Explorer"),
    AddProp("participant", "study.phs_accession", "phs_accession", "Study"),
    AddProp("study", "data_access_level", "acl", "Study"))

  /** `cds-transformation.py:61-64`. */
  val defaultRemoveNodes: Set[String] = Set("diagnosis", "participant")

  /** `cds-transformation.py:146`. */
  val defaultStudyDrops: Seq[String] =
    Seq("size_of_data_being_uploaded", "study_external_url")

  /** The v1 config's file/sheet wiring (`cds_config_example.yaml` +
    * cds-transformation.py:80-112): two workbooks, each owning a FIXED
    * sheet set — DATA_FILE1 carries the manifest-side sheets, DATA_FILE2
    * the submission-side sheets. `sheetFile` maps each expected sheet
    * name to the workbook path that must supply it. */
  final case class V1Config(nodeFile: String, dataFile1: String,
                            dataFile2: String, outputFolder: String) {
    val sheetFile: Map[String, String] = Map(
      "CDS Manifest" -> dataFile1,
      "CGC CDS Explorer" -> dataFile1,
      "SRA Run Selector" -> dataFile1,
      "Participant" -> dataFile2,
      "Sample" -> dataFile2,
      "File" -> dataFile2,
      "Genomic Info" -> dataFile2,
      "Study" -> dataFile2)
  }

  /** Parse the v1 flat config verbatim (NODE_FILE, DATA_FILE1,
    * DATA_FILE2, OUTPUT_FOLDER — the four keys `cds-transformation.py`
    * reads). Missing keys fail loudly by name. */
  def configFromV1Yaml(configYaml: String): V1Config = {
    val cfg = MultiSheet.parseFlatConfig(configYaml)
    def req(key: String): String = cfg.getOrElse(key,
      sys.error(s"v1 config is missing required key $key"))
    V1Config(req("NODE_FILE"), req("DATA_FILE1"), req("DATA_FILE2"),
      req("OUTPUT_FOLDER"))
  }

  private def norm(c: String): String = c.replace(" ", "_").toLowerCase

  private def matches(colName: String, prop: String): Boolean = {
    val n = norm(colName)
    n.contains(prop) || prop.contains(n)
  }

  /** Replicate a one-row scalar frame (the transposed Study sheet, S3) to
    * `like`'s row set — `Study_df[header] = [value] * len(CDS_Manifest_df)`
    * (`cds-transformation.py:117-121`): a broadcast cross join carrying
    * `like`'s row index. */
  def scalarSheet(oneRow: DataFrame, like: DataFrame, rowIdx: String): DataFrame =
    like.select(col(rowIdx)).crossJoin(broadcast(oneRow))

  /** extract_data's new_df: for each property the last matching (sheet,
    * column) in order wins; the first matching sheet anchors the rows.
    * Returns None when no property matched any sheet. */
  private def extractNewDf(
      sheets: Seq[(String, DataFrame)], props: Seq[String],
      rowIdx: String): Option[DataFrame] = {
    // (prop -> (sheetName, col)) with last-match-wins
    val picks: Seq[(String, (String, String))] = props.flatMap { p =>
      val hits = for {
        (sn, df) <- sheets
        c <- df.columns if c != rowIdx && matches(c, p)
      } yield (sn, c)
      hits.lastOption.map(h => p -> h)
    }
    if (picks.isEmpty) return None
    // anchor = first sheet (in sheet order) that MATCHED any property —
    // even if its assignments were later overwritten: pandas' first
    // `new_df[p] = sheet[col]` fixes the frame's index regardless of who
    // wins the value (`cds-transformation.py:11-19`)
    val (anchorName, anchorDf) = sheets.find { case (_, df) =>
      df.columns.exists(c => c != rowIdx && props.exists(p => matches(c, p)))
    }.get // nonEmpty: picks came from these sheets
    val contributing = sheets.filter { case (sn, _) => picks.exists(_._2._1 == sn) }
    def colsOf(sn: String, df: DataFrame): Seq[Column] =
      picks.collect { case (p, (`sn`, c)) => df(c).as(p) }
    var out = anchorDf.select(col(rowIdx) +: colsOf(anchorName, anchorDf): _*)
    for ((sn, df) <- contributing if sn != anchorName) {
      val side = df.select(col(rowIdx) +: colsOf(sn, df): _*)
      out = out.join(side, Seq(rowIdx), "left")
    }
    Some(out)
  }

  /** Accumulate new columns into the node frame: join on the first shared
    * property, else align by row index (`outer` pads like pandas concat,
    * `left` truncates like add_properties). */
  private def accumulate(
      df: Option[DataFrame], newDf: DataFrame, rowIdx: String,
      concatType: String, dedupAfterJoin: Boolean): DataFrame =
    df match {
      case None => newDf
      case Some(d) =>
        val newProps = newDf.columns.filterNot(_ == rowIdx)
        newProps.find(p => d.columns.contains(p)) match {
          case Some(key) =>
            // pandas `df.join(new_df.set_index(key), on=key)` RAISES when
            // any remaining new column already exists in df ("columns
            // overlap but no suffix specified") — mirror the abort instead
            // of silently emitting duplicate column names that explode on
            // first downstream reference (`cds-transformation.py:22,51`)
            val overlap = newProps.filter(p => p != key && d.columns.contains(p))
            require(overlap.isEmpty,
              s"accumulate: columns ${overlap.mkString(", ")} overlap the node frame " +
                s"besides join key '$key' (pandas join would raise here)")
            // duplicate keys multiply rows exactly as pandas join does;
            // add_properties then dedups FULL rows (`:52`). pandas
            // drop_duplicates ignores the INDEX and keeps the first
            // occurrence — so dedup on the data columns only, retaining
            // the minimal row index per duplicate group
            val joined = d.join(newDf.drop(rowIdx), Seq(key), "left")
            if (dedupAfterJoin) {
              val dataCols = joined.columns.filterNot(_ == rowIdx).toSeq
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(dataCols.map(graft.ColNames.q): _*)
                .orderBy(col(rowIdx))
              joined.withColumn("__dd", row_number().over(w))
                .filter(col("__dd") === 1).drop("__dd")
            } else joined
          case None =>
            d.join(newDf, Seq(rowIdx), concatType)
        }
    }

  /** Run the v1 orchestration. `sheets` are (name, frame) in the
    * reference's df_list order, each frame carrying a caller-supplied
    * row-index column `rowIdx` (ordinal within the sheet); `model` maps
    * node -> properties. Returns one frame per surviving node, row index
    * dropped. */
  def run(
      sheets: Seq[(String, DataFrame)],
      model: Seq[(String, Seq[String])],
      extraSheets: Map[String, DataFrame] = Map.empty,
      soloSheets: Map[String, Seq[String]] = Map("participant" -> Seq("Participant")),
      addProps: Seq[AddProp] = defaultAddProps,
      removeNodes: Set[String] = defaultRemoveNodes,
      studyDrops: Seq[String] = defaultStudyDrops,
      rowIdx: String = "__row"): Map[String, DataFrame] = {
    // extraSheets: readable by solo/add-prop rules but NOT in the pass-1
    // scrape list — the reference keeps Participant out of df_list (:131)
    val byName = sheets.toMap ++ extraSheets
    val out = model.flatMap { case (node, props) =>
      // pass 1: the full sheet list
      var df: Option[DataFrame] =
        extractNewDf(sheets, props, rowIdx).map(_.withColumn("type", lit(node)))
      // remove_node (then optionally re-extract from a node-specific sheet
      // list — the reference's "participant only from Participant" rule)
      if (removeNodes.contains(node)) df = None
      val solo = soloSheets.getOrElse(node, Nil)
        .flatMap(n => byName.get(n).map(n -> _))
      if (solo.nonEmpty) {
        extractNewDf(solo, props, rowIdx).foreach { nd =>
          df = Some(accumulate(df, nd, rowIdx, "outer", dedupAfterJoin = false)
            .withColumn("type", lit(node)))
        }
      }
      // add_properties per source sheet — one multi-column new_df per
      // (node, source), like the reference's add_properties calls; sources
      // apply in the order THIS NODE's rules first mention them (the
      // reference's fixed call order falls out of its table ordering)
      val nodeRules = addProps.filter(_.node == node)
      for ((source, rules) <- nodeRules.groupBy(_.source)
             .toSeq.sortBy { case (s, _) => nodeRules.indexWhere(_.source == s) };
           src <- byName.get(source)) {
        if (df.isDefined) {
          val cols = rules.filter(r => src.columns.contains(r.sourceCol))
            .map(r => src(r.sourceCol).as(r.newProperty))
          if (cols.nonEmpty) {
            val nd = src.select(col(rowIdx) +: cols: _*)
            df = Some(accumulate(df, nd, rowIdx, "left", dedupAfterJoin = true))
          }
        }
      }
      df.map(node -> _.drop(rowIdx))
    }.toMap
    // study cleanup: hardcoded drops + dedup (`:146-148`)
    out.get("study") match {
      case Some(s) =>
        out + ("study" -> s.drop(studyDrops: _*).dropDuplicates())
      case None => out
    }
  }
}
