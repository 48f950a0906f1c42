package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Cell-level cleansing operators (SURVEY.md §2.2: P3, P4, P5, P6, P9).
  *
  * Reference behavior re-expressed Spark-first:
  *  - P3 blank→null: `cds-transformation_v1.3.py:134` (`replace(r'^\s*$', NaN)`)
  *  - P4 trim: `cds-transformation_v1.3.py:136`
  *  - P5 clean_data enum normalization: `cds_transformation_functions.py:10-55`
  *  - P6 lossless integer coercion: `cds_transformation_functions.py:56-72`
  *
  * All of these are narrow (per-row) projections: no shuffle, fully inside
  * whole-stage codegen, and Catalyst folds consecutive `select`s into one
  * projection — at 100 TB these cost exactly one pass over the scan.
  * Dictionaries are embedded as literal `map(...)` expressions (the clean
  * dict is ~1.3k entries — well under any broadcast concern; a literal map
  * is codegen'd into the projection itself, no broadcast var needed).
  */
object Normalize {

  private def stringCols(df: DataFrame): Seq[String] =
    df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq

  /** P3: whitespace-only or empty string cells → null, on every string column. */
  def blanksToNull(df: DataFrame): DataFrame = {
    val cols = df.columns.map { c =>
      if (stringCols(df).contains(c))
        when(trim(graft.ColNames.q(c)) === "", lit(null).cast(StringType)).otherwise(graft.ColNames.q(c)).as(c)
      else graft.ColNames.q(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** P4: trim surrounding whitespace on every string column. */
  def trimAll(df: DataFrame): DataFrame = {
    val sc = stringCols(df).toSet
    val cols = df.columns.map { c =>
      if (sc.contains(c)) trim(graft.ColNames.q(c)).as(c) else graft.ColNames.q(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The sink value for clean-dict entries too long to be YAML keys
    * (cds_transformation_functions.py:46-48). */
  val NotSpecified = "Not specified in data"

  /** Reference gate on WHETHER a prop is cleaned at all
    * (cds_transformation_functions.py:29-31): only enum-typed props are
    * cleaned, and a vocabulary that is a lone placeholder — `['TBD']` or
    * `['not reported']` — marks a not-yet-modeled free-text prop whose
    * values must pass through untouched. */
  def enumCleanable(enumValues: Seq[String]): Boolean =
    enumValues.nonEmpty &&
      (enumValues.length > 1 ||
        (enumValues.head != "TBD" && enumValues.head != "not reported"))

  /** P5: clean-dict value normalization for one column.
    *
    * Semantics, in reference precedence (cds_transformation_functions.py:31-55):
    *   - value already in the controlled vocabulary (`enum`) → unchanged
    *   - value has a clean-dict mapping → replaced (mapping may be to null,
    *     e.g. morphology codes mis-read as dates, cds_clean_dict_v1.3.yaml:1240-1263)
    *   - value is NULL and the prop declares a `nan_value` → that fill
    *     (cds_transformation_functions.py:44-45)
    *   - value is in the shared `extra_long_values` list (values too long
    *     to key a YAML map) → [[NotSpecified]]
    *     (cds_transformation_functions.py:46-48, cds_clean_dict_v1.3.yaml:1267)
    *   - otherwise → passthrough
    *
    * Callers deciding per-prop whether to clean at all should gate on
    * [[enumCleanable]] (the Pipeline does). Still one narrow codegen'd
    * projection — each branch is an `isin`/literal-map probe, no shuffle. */
  def cleanValues(
      c: Column,
      mapping: Map[String, Option[String]],
      enumValues: Seq[String] = Nil,
      nanValue: Option[String] = None,
      extraLongValues: Seq[String] = Nil): Column = {
    val toNull = mapping.collect { case (k, None) => k }.toSeq
    val live = mapping.collect { case (k, Some(v)) => Seq(lit(k), lit(v)) }.flatten.toSeq
    // compose lowest-precedence-first, each rule wrapping the previous
    var expr: Column = c
    if (extraLongValues.nonEmpty)
      expr = when(c.isin(extraLongValues: _*), lit(NotSpecified)).otherwise(expr)
    nanValue.foreach(v => expr = when(c.isNull, lit(v)).otherwise(expr))
    if (live.nonEmpty)
      // null c → null lookup → falls through to the wrapped rules
      expr = coalesce(element_at(map(live: _*), c), expr)
    if (toNull.nonEmpty)
      expr = when(c.isin(toNull: _*), lit(null).cast(StringType)).otherwise(expr)
    if (enumValues.nonEmpty)
      expr = when(c.isin(enumValues: _*), c).otherwise(expr)
    expr
  }

  /** P6: lossless integer coercion on a string column.
    * A value parseable as a double with no fractional part is rewritten as
    * its integer rendering ("25.0" → "25"); anything else is kept verbatim
    * (the engine stays string-typed until the sink, mirroring the
    * reference's keep_default_na=False string-first behavior). */
  def losslessInt(c: Column): Column = {
    val d = c.cast(StringType).try_cast("double")
    // 2^53: beyond it doubles cannot represent every integer, so the
    // round-trip would silently rewrite long ids to a DIFFERENT integer
    // ("9007199254740993" -> ...992) — keep such strings verbatim instead
    when(d.isNotNull && d === floor(d) && abs(d) < lit(9007199254740992.0),
      d.cast("long").cast(StringType)).otherwise(c)
  }

  /** Lossless number formatter for id synthesis (J7's convert_to_string,
    * cds_transformation_functions.py:391-399): integral floats print
    * integer-style, everything else prints verbatim. */
  def losslessNumFmt(c: Column): Column = losslessInt(c.cast(StringType))

  /** P9 / V3 fill: replace nulls in the given string columns with a literal. */
  def fillMissing(df: DataFrame, cols: Seq[String], value: String): DataFrame =
    df.na.fill(value, cols)

  /** Number-with-units normalization (§1.2 `size_of_data_being_uploaded`,
    * units GB/TB/PB, cds-model-props.yml:7981-7985): "1.5 TB" → bytes.
    * Unrecognized unit or unparseable number → null (validation surfaces
    * it). Decimal powers (10⁹/10¹²/10¹⁵), matching the model's intent. */
  /** Multi-format timestamp parsing — normalize a string column whose
    * rows mix date renderings (the reference's per-study workbooks carry
    * whatever format a site typed; a curation pipeline meets the same in
    * crawled metadata). First format that parses wins (`try_to_timestamp`
    * returns null instead of throwing, so the coalesce chain is a pure
    * codegen projection — zero shuffles, no UDF); a row matching no
    * format comes back null for a downstream validation to flag. Order
    * formats most-specific-first: an ambiguous row (e.g. `01/02/2024`)
    * parses under the FIRST format that accepts it. */
  def parseTimestampMulti(c: Column, formats: Seq[String]): Column = {
    require(formats.nonEmpty, "parseTimestampMulti: formats required")
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)
  }

  def unitsToBytes(c: Column): Column = {
    val num = trim(regexp_extract(c, "^\\s*([0-9.]+)\\s*([A-Za-z]+)\\s*$", 1)).try_cast("double")
    val unit = upper(regexp_extract(c, "^\\s*([0-9.]+)\\s*([A-Za-z]+)\\s*$", 2))
    val factor = element_at(
      map(lit("GB"), lit(1.0e9), lit("TB"), lit(1.0e12), lit("PB"), lit(1.0e15)),
      unit)
    // floor before the integral cast: double->long CAST truncates in Spark
    // but ROUNDS in some engines (DuckDB) — flooring first makes the value
    // integral so every engine lands on the same long
    floor(num * factor)
  }
}
