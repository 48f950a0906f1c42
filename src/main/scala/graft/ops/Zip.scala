package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J2 — positional column concat (`cds-transformation.py:26-27,54-56`):
  * pandas `pd.concat([a, b], axis=1)` zips two frames row-by-row with the
  * longer side truncated. Relational engines have no row order, so the
  * zip must be made explicit: each side gets a row index under a CALLER-
  * SUPPLIED total ordering, then an inner equi-join on the index (inner =
  * the reference's truncation of the longer side).
  *
  * Scale note: `row_number` over an un-partitioned window funnels each
  * side through one task — acceptable for the reference's v1 workbook
  * frames (10⁴–10⁵ rows) where this operator appears, and inherently so:
  * a global positional zip IS a sequential construct. Data-scale zips
  * should use keyed joins instead (the engine's J1/J5 paths).
  */
object Zip {

  def positional(
      a: DataFrame, orderA: Seq[Column],
      b: DataFrame, orderB: Seq[Column],
      idxCol: String = "rn"): DataFrame = {
    val ra = a.withColumn(idxCol,
      row_number().over(Window.orderBy(orderA: _*)).cast("long"))
    val rb = b.withColumn(idxCol,
      row_number().over(Window.orderBy(orderB: _*)).cast("long"))
    ra.join(rb, Seq(idxCol))
  }
}
