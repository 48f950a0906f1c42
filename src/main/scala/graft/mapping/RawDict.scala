package graft.mapping

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1/P2 — dict-driven projection and fuzzy schema matching
  * (SURVEY.md §2.2).
  *
  * P1 ("extract", `cds-transformation_v1.3.py:69-81`): for each model
  * property of a node, find its raw column via the raw dict (first mapped
  * column that exists and is not all-null), project it under the property
  * name, and add a literal `type = node` discriminator. The all-null probe
  * is a single aggregate pass computing `count(col)` for every candidate at
  * once — one job regardless of column count (the reference probes
  * per-column).
  *
  * P2 (fuzzy matcher, `cds-transformation_v1.3.py:16-33`): Ratcliff–
  * Obershelp similarity between normalized raw column names and model
  * property names, threshold RATIO_LIMIT = 0.75
  * (`cds_config_example_v1.3.yaml:5`). This is a *schema-level* operation
  * over `df.columns` — driver-side by design; data never moves.
  */
object RawDict {

  /** Ratcliff–Obershelp similarity (same algorithm as Python difflib's
    * `SequenceMatcher.ratio`): 2*M / (|a|+|b|) where M is the total length
    * of matching blocks found by recursive longest-common-substring. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    def matchBlocks(al: Int, ah: Int, bl: Int, bh: Int): Int = {
      // longest common substring of a[al,ah) x b[bl,bh)
      var bestI = al; var bestJ = bl; var bestLen = 0
      var i = al
      while (i < ah) {
        var j = bl
        while (j < bh) {
          if (a(i) == b(j)) {
            var len = 0
            while (i + len < ah && j + len < bh && a(i + len) == b(j + len)) len += 1
            if (len > bestLen) { bestLen = len; bestI = i; bestJ = j }
          }
          j += 1
        }
        i += 1
      }
      if (bestLen == 0) 0
      else
        bestLen +
          matchBlocks(al, bestI, bl, bestJ) +
          matchBlocks(bestI + bestLen, ah, bestJ + bestLen, bh)
    }
    2.0 * matchBlocks(0, a.length, 0, b.length) / (a.length + b.length)
  }

  private def normalize(name: String): String =
    name.toLowerCase.replace(" ", "_")

  /** P2: best property match per raw column at or above the threshold. */
  def fuzzyMatch(
      rawColumns: Seq[String],
      properties: Seq[String],
      ratioLimit: Double = 0.75): Map[String, String] =
    rawColumns.flatMap { raw =>
      val n = normalize(raw)
      val scored = properties.map(p => p -> ratio(n, normalize(p)))
      val (best, r) = scored.maxBy { case (p, s) => (s, p) }
      if (r >= ratioLimit) Some(raw -> best) else None
    }.toMap

  /** §3.2 `--extract_raw_data_dictionary` mode: bootstrap a raw dict for
    * every model node from a frame's columns (fuzzy matcher over the
    * schema; output is the node → raw column → property mapping a human
    * then curates — the reference keeps 10 dated curated versions of it).
    * Pure driver-side schema work; the data never moves. */
  def inferDict(
      columns: Seq[String],
      nodeProps: Map[String, Seq[String]],
      ratioLimit: Double = 0.75): Map[String, Seq[(String, String)]] =
    nodeProps.map { case (node, props) =>
      node -> columns.flatMap { raw =>
        fuzzyMatch(Seq(raw), props, ratioLimit).headOption
      }
    }.filter(_._2.nonEmpty)

  /** §3.2 emission half of the bootstrap: render an inferred dict as the
    * reference-shaped raw-dict YAML (node → raw column → property,
    * `cds_raw_dict_v1.3.yaml:18-32`; dumped by the
    * `--extract_raw_data_dictionary` mode at
    * `cds-transformation_v1.3.py:209-211`). Per-node insertion order is
    * preserved (P1's first-live-candidate rule depends on it); nodes are
    * emitted sorted unless `nodeOrder` pins an order. snakeyaml handles
    * quoting, so any header text (colons, quotes, unicode) survives an
    * emit → [[graft.model.ModelLoader.parseRawDict]] round trip
    * unchanged. */
  def renderRawDictYaml(
      dict: Map[String, Seq[(String, String)]],
      nodeOrder: Seq[String] = Nil): String = {
    val root = new java.util.LinkedHashMap[String, Any]()
    val order =
      if (nodeOrder.nonEmpty) nodeOrder.filter(dict.contains)
      else dict.keys.toSeq.sorted
    order.foreach { n =>
      val m = new java.util.LinkedHashMap[String, String]()
      dict(n).foreach { case (raw, prop) =>
        // a YAML map cannot carry duplicate keys: silently collapsing a
        // duplicated raw header would emit a dict that reloads SHORTER
        // than the input (round-trip violation) — fail loudly instead
        require(!m.containsKey(raw),
          s"duplicate raw column '$raw' in node '$n' cannot round-trip through YAML")
        m.put(raw, prop)
      }
      root.put(n, m)
    }
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(root)
  }

  /** One node's row in a dict-drift report ([[RawDict.drift]]). */
  final case class DictDrift(
      node: String, status: String,
      added: Long, removed: Long, retargeted: Long)

  /** §3.2 dict-drift report: the curated raw dict is an audit trail of
    * dated versions (10 under `cds_config_v1.3/`, e.g.
    * `cds_raw_dict_v1.3_2023_Jan.yaml` vs `_2024_Mar.yaml`); diff two of
    * them per node — raw columns added, removed, or retargeted (same raw
    * header now mapping to a DIFFERENT property — the silent killer, since
    * row counts don't change). Nodes appearing/disappearing wholesale are
    * flagged by `status`. Driver-side config work like every dict
    * operation; the data plane never moves. */
  def drift(
      old: Map[String, Seq[(String, String)]],
      neu: Map[String, Seq[(String, String)]]): Seq[DictDrift] =
    (old.keySet ++ neu.keySet).toSeq.sorted.map { n =>
      // a duplicate raw header within one node would silently collapse
      // under toMap (last mapping wins) and undercount the diff — a
      // malformed dict must surface, not skew the audit
      def toMapStrict(side: String, m: Seq[(String, String)]): Map[String, String] = {
        val dups = m.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
        require(dups.isEmpty,
          s"drift: node '$n' ($side dict) repeats raw header(s) ${dups.mkString(", ")}")
        m.toMap
      }
      val om = toMapStrict("old", old.getOrElse(n, Nil))
      val nm = toMapStrict("new", neu.getOrElse(n, Nil))
      val status =
        if (!old.contains(n)) "added"
        else if (!neu.contains(n)) "removed"
        else "kept"
      DictDrift(n, status,
        (nm.keySet -- om.keySet).size.toLong,
        (om.keySet -- nm.keySet).size.toLong,
        (om.keySet & nm.keySet).count(k => om(k) != nm(k)).toLong)
    }

  /** P1: project raw columns onto model property names, keeping only
    * mappings whose raw column exists and has at least one non-null value,
    * then tag with the node discriminator. */
  def extract(df: DataFrame, mapping: Seq[(String, String)], node: String): DataFrame = {
    val present = mapping.filter { case (raw, _) => df.columns.contains(raw) }
    if (present.isEmpty)
      // no mapped raw column exists: the reference creates no node frame at
      // all (cds-transformation_v1.3.py:74-81); our analog is an empty frame
      // carrying only the discriminator.
      return df.select(lit(node).as("type")).filter(lit(false))
    // One aggregate pass probing all candidates for non-nullness. This is a
    // deliberate eager action at plan-construction time (the mapping decides
    // the *schema*, which Spark needs before the plan exists); callers that
    // know their columns are live can skip it via `extractAssumeLive`.
    // q(): raw workbook headers may contain dots ("Sample.ID") — bare
    // col() would parse them as struct access
    val probes = present.map { case (raw, _) => count(graft.ColNames.q(raw)).as(raw) }
    val counts = df.agg(probes.head, probes.tail: _*).first()
    val live = present.filter { case (raw, _) => counts.getAs[Long](raw) > 0 }
    // first-match rule (match_col_from_raw_dict, cds-transformation_v1.3
    // .py:53-66): several raw columns may map to one property (GUID/guid →
    // file_id); the FIRST live candidate in dict order wins.
    val firstPerProp = live.foldLeft(Vector.empty[(String, String)]) {
      case (acc, (raw, prop)) =>
        if (acc.exists(_._2 == prop)) acc else acc :+ (raw -> prop)
    }
    val cols: Seq[Column] = firstPerProp.map { case (raw, prop) =>
      graft.ColNames.q(raw).as(prop) } :+ lit(node).as("type")
    df.select(cols: _*)
  }

  /** P1, v1.2 COLUMN-keyed variant (`extract_data`,
    * cds-transformation_v1.2.py:52-77): iterate the sheet's columns in
    * order; a column that the node's dict maps and that carries at least
    * one non-null value projects under its property name. Differences
    * from the v1.3 prop-keyed [[extract]]: iteration is over COLUMNS (so
    * when two live columns map to one property, the LAST one's values
    * win — pandas overwrites `new_df[prop]` in place — while the
    * property's POSITION is its first assignment's), and the `type`
    * discriminator is added only when some extracted row is non-all-null
    * (`:74-76`; with the liveness probe all projected columns have
    * values, so any live mapping implies it). Same single-aggregate
    * liveness probe as [[extract]] — a deliberate driver action, the
    * mapping decides the schema. */
  def extractByColumn(df: DataFrame, mapping: Map[String, String], node: String): DataFrame = {
    val present = df.columns.filter(mapping.contains).toSeq
    if (present.isEmpty) return df.select(lit(node).as("type")).filter(lit(false))
    val probes = present.map(raw => count(graft.ColNames.q(raw)).as(raw))
    val counts = df.agg(probes.head, probes.tail: _*).first()
    val live = present.filter(raw => counts.getAs[Long](raw) > 0)
    if (live.isEmpty) return df.select(lit(node).as("type")).filter(lit(false))
    val lastPerProp = live.map(raw => mapping(raw) -> raw).toMap // later wins
    val order = live.map(mapping).distinct                       // first position
    val cols: Seq[Column] = order.map(p =>
      graft.ColNames.q(lastPerProp(p)).as(p)) :+ lit(node).as("type")
    df.select(cols: _*)
  }

  /** P1 without the all-null probe: lazy, composes like every other
    * operator. Use when the mapping is known-live (e.g. curated dicts). */
  def extractAssumeLive(df: DataFrame, mapping: Seq[(String, String)], node: String): DataFrame = {
    val present = mapping.filter { case (raw, _) => df.columns.contains(raw) }
      .foldLeft(Vector.empty[(String, String)]) { case (acc, (raw, prop)) =>
        if (acc.exists(_._2 == prop)) acc else acc :+ (raw -> prop)
      }
    val cols: Seq[Column] = present.map { case (raw, prop) =>
      graft.ColNames.q(raw).as(prop) } :+ lit(node).as("type")
    if (present.isEmpty) df.select(lit(node).as("type")).filter(lit(false))
    else df.select(cols: _*)
  }
}
