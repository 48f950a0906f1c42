package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation operators — the reference's "query" workload
  * (SURVEY.md §2.5 V1–V5, §2.4 A3/A4/A5).
  *
  * Each validation is a pure DataFrame derivation that yields a *report*
  * frame (the reference writes these as `*_validation_result.tsv`,
  * `cds_transformation_functions.py:197-207`). All are single-pass
  * aggregations or filters: at 100 TB they cost one scan + one hash
  * aggregate on the node's id — no driver-side iteration (the reference
  * loops rows in Python; we do not).
  */
object Validations {

  /** A3: ids occurring more than once (or null) within a node
    * (`cds_transformation_functions.py:249`). */
  def duplicateIds(df: DataFrame, id: String): DataFrame =
    df.groupBy(graft.ColNames.q(id))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1 || graft.ColNames.q(id).isNull)

  /** A4 + V1 core: for each duplicated id, which columns disagree across
    * the duplicate rows (`cds_transformation_functions.py:253-262`).
    * Output: (id, cnt, conflicted_columns as ", "-joined sorted list).
    * Single hash aggregate; `count(distinct …)` per column is planned as
    * one expand+aggregate, still one shuffle on the id. */
  def conflictColumns(df: DataFrame, id: String, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      cols.map(c => (countDistinct(graft.ColNames.q(c)) > 1).as(s"__conf_$c"))
    val flags = df.groupBy(graft.ColNames.q(id)).agg(aggs.head, aggs.tail: _*)
    // q(): the flag aliases embed the source column name, which may be a
    // dotted parent pointer ("study.phs_accession")
    val confArr = array(cols.sorted.map(c =>
      when(graft.ColNames.q(s"__conf_$c"), lit(c))): _*)
    flags
      .filter(col("cnt") > 1)
      .withColumn("conflicted_columns", array_join(filter(confArr, _.isNotNull), ", "))
      .select(graft.ColNames.q(id), col("cnt"), col("conflicted_columns"))
  }

  /** V1 composition: rows whose id occurs exactly once. One shuffle — a
    * count over a window on the id — instead of the two-scan
    * aggregate-then-anti-join shape (`duplicateIds` + `left_anti`), which
    * costs a second scan and a second shuffle of the full table. Null ids
    * are never unique (the reference flags them as invalid,
    * `cds_transformation_functions.py:249`). */
  def uniqueRows(df: DataFrame, id: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(graft.ColNames.q(id))
    df.withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("__cnt") === 1 && graft.ColNames.q(id).isNotNull)
      .drop("__cnt")
  }

  /** A5 + V2: rows whose parent pointers are ALL null — the reference
    * builds per-column lists and intersects them
    * (`cds_transformation_functions.py:222-238`); one filter suffices. */
  def orphans(df: DataFrame, parentCols: Seq[String]): DataFrame =
    df.filter(parentCols.map(graft.ColNames.q(_).isNull).reduce(_ && _))

  /** V2 variant for real FK checks: child rows whose fk has no match in the
    * parent table (left_anti join — map-side when parent ids broadcast). */
  def missingParents(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(graft.ColNames.q(pk).as(fk)).distinct(), Seq(fk), "left_anti")

  /** V4: SSN-shaped substring scan (`cds_transformation_functions.py:284-299`).
    * Patterns ddd-dd-dddd, ddd_dd_dddd, and bare 9 digits bounded by
    * non-digits (java regex supports the reference's lookaround as-is). */
  val SsnPatterns: Seq[String] =
    Seq("""\d{3}-\d{2}-\d{4}""", """\d{3}_\d{2}_\d{4}""", """(?<=\D)\d{9}(?=\D)""")

  def ssnScan(df: DataFrame, c: String): DataFrame = {
    val alternation = SsnPatterns.mkString("(", ")|(", ")")
    df.withColumn("ssn_matches",
        array_join(regexp_extract_all(graft.ColNames.q(c), lit(alternation), lit(0)), ", "))
      .filter(length(col("ssn_matches")) > 0)
  }

  /** V4 portable variant: single RE2-safe pattern (no lookaround), usable
    * verbatim by engines without java-regex lookbehind (the oracle). */
  val SsnPatternPortable = "[0-9]{3}[-_][0-9]{2}[-_][0-9]{4}"

  def ssnScanPortable(df: DataFrame, c: String): DataFrame =
    df.withColumn("ssn_matches",
        array_join(regexp_extract_all(graft.ColNames.q(c), lit(SsnPatternPortable), lit(0)), ", "))
      .filter(length(col("ssn_matches")) > 0)

  /** V3: UI validation fill — required columns that are absent get injected
    * as a constant; present-but-null cells are filled
    * (`cds_transformation_functions.py:303-344`).
    *
    * `exempt` props are REPORTED when missing ([[uiMissingReport]]) but
    * never touched by the fill: no column injection when absent
    * (`cds_transformation_functions.py:322-325`) and no null-replace when
    * present (`:333-335`). The reference hardcodes one such prop
    * (`experimental_strategy_and_data_subtypes`, `:322,333`) — so on its
    * real UI workbook the emitted `genomic_info` TSV deliberately lacks
    * that column. */
  val NotSpecified = "Not specified in data"

  /** The reference's hardcoded report-but-never-fill property
    * (`cds_transformation_functions.py:322,333`). */
  val UiFillExempt: Set[String] = Set("experimental_strategy_and_data_subtypes")

  def uiFill(df: DataFrame, required: Seq[String], fill: String = NotSpecified,
      exempt: Set[String] = UiFillExempt): DataFrame = {
    val present = df.columns.toSet
    val fillable = required.filterNot(exempt.contains)
    val withCols = fillable.filterNot(present.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(fill)))
    withCols.na.fill(fill, fillable)
  }

  /** V3's REPORT leg (`ui_validation`, cds_transformation_functions
    * .py:318-329): one audit row per UI-required property ABSENT from the
    * node frame — the rows the reference accumulates into
    * `property_validation_df` (columns `Missing_Properties` =
    * "node.prop", `UI_Related`, `Raw_Data_File`;
    * cds-transformation_v1.3.py:105) alongside the [[uiFill]] that adds
    * the column. All-null-but-present columns are filled WITHOUT a report
    * row, exactly as the reference's elif branch does. Driver-side schema
    * comparison by design — config plane, the data never moves. */
  def uiMissingReport(
      df: DataFrame, node: String, required: Seq[String],
      rawDataFile: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val present = df.columns.toSet
    required.sorted.filterNot(present.contains)
      .map(p => (s"$node.$p", true, rawDataFile))
      .toDF("missing_property", "ui_related", "raw_data_file")
  }

  /** S10: required-property list for one node from the UI-mapping sheet
    * (`2-Config-Files/cds_config/UI-database mappings_v3.xlsx`, read at
    * `cds_transformation_functions.py:309-312`): distinct `Property Name`
    * values where `Node Name` matches, excluding the `-` placeholder and
    * blanks (the reference's NaN under `keep_default_na=True`). Sorted for
    * a deterministic fill order. Driver-side collect by design — the
    * mapping sheet is a configuration artifact of ~10² rows. */
  def uiRequiredFromMapping(mapping: DataFrame, node: String): Seq[String] =
    mapping
      .filter(col("Node Name") === node &&
        col("Property Name").isNotNull && col("Property Name") =!= "-")
      .select(col("Property Name")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** Regex-pattern property validation (model regex types, SURVEY.md §1.2):
    * rows where `c` is non-null and does NOT match `pattern`. */
  def patternViolations(df: DataFrame, c: String, pattern: String): DataFrame =
    df.filter(graft.ColNames.q(c).isNotNull &&
      !regexp_like(graft.ColNames.q(c), lit(pattern)))

  /** Enum-domain violations: non-null values outside the vocabulary. */
  def enumViolations(df: DataFrame, c: String, domain: Seq[String]): DataFrame =
    df.filter(graft.ColNames.q(c).isNotNull &&
      !graft.ColNames.q(c).isin(domain: _*))

  /** Order-independent table checksum — the 100 TB answer to "did the
    * copy/migration/engine-swap preserve every row?" that the reference
    * can only answer by re-reading whole frames into pandas.
    *
    * Each row's chosen columns are canonicalized (`CAST AS STRING`, nulls
    * as a `\u0000` (NUL) sentinel so null layout is part of the checksum,
    * `'|'`-joined), md5-hashed, truncated to 40 bits, and SUMMED as
    * DECIMAL(38,0). Sum is commutative/associative → map-side partial
    * aggregation; one scan, a 1-row shuffle, and two tables compare by a
    * single row regardless of size or row order. 40-bit terms in a 38-digit
    * decimal leave headroom for ~10²⁵ rows. The checksum is EMITTED as a
    * STRING so the value compares identically across engines regardless of
    * how each canonicalizes DECIMAL output.
    *
    * Pass only columns whose string rendering is engine-portable (ints,
    * strings, dates) — float/timestamp formatting differs across engines;
    * canonicalize those to ints first (e.g. `floor(x * 100)`). */
  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007) — the privacy gate a training-data release runs beside the
    * PII sweep (V4/t7): every quasi-identifier combination must cover at
    * least k records (else those records are re-identifiable by joining
    * public attributes) and carry at least l distinct sensitive values
    * (else the group's sensitive value is learnable even at k). ONE
    * map-side-combinable aggregate over the quasi keys — group count +
    * distinct-sensitive count — so the audit scans once and shuffles the
    * quasi-key domain, not the corpus. Output: one row per group with
    * both flags. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], sensitive: String,
                 k: Int, l: Int): DataFrame = {
    require(quasi.nonEmpty && k >= 1 && l >= 1)
    df.groupBy(quasi.map(graft.ColNames.q): _*)
      .agg(count(lit(1)).as("group_n"),
        count_distinct(graft.ColNames.q(sensitive)).as("l_div"))
      .select(quasi.map(graft.ColNames.q) ++ Seq(col("group_n"), col("l_div"),
        (col("group_n") >= k).cast("long").as("k_ok"),
        (col("l_div") >= l).cast("long").as("l_ok")): _*)
  }

  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    val canon = concat_ws("|",
      cols.map(c => coalesce(graft.ColNames.q(c).cast("string"), lit("\u0000"))): _*)
    val term = conv(substring(md5(canon), 1, 10), 16, 10).cast("decimal(38,0)")
    df.agg(count(lit(1)).as("n_rows"),
      sum(term).cast("string").as("fingerprint"))
  }
}
