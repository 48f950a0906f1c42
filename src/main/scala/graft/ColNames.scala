package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Column-name hygiene: the engine's parent-pointer columns are literally
  * named `"{parent}.{prop}"` (reference convention, SURVEY.md §1.1), and a
  * bare `col("study.phs_accession")` would parse as struct-field access.
  * Every operator that iterates dynamic column names resolves them through
  * this backtick-quoting helper. */
object ColNames {
  def q(name: String): Column = col(s"`$name`")
}
