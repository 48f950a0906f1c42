package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: as-of join and
  * interval (range) join. Both are expressed as single-shuffle equi-join
  * plans — never a per-key subquery (the reference's pandas idiom would be
  * an O(n·m) row loop) and never a BroadcastNestedLoopJoin over an
  * inequality predicate, which is the plan Spark itself picks for a raw
  * range condition and which dies at scale.
  */
object TemporalJoin {

  /** As-of join: for every `left` row, attach the single latest `right`
    * row with `right[rightTime] <= left[leftTime]` and matching key; ties
    * on `rightTime` broken by the highest `rightTieBreak`. Right payload
    * columns come back null when no right row qualifies (left-outer
    * semantics).
    *
    * Shape: tag both sides, union, one window over (key) ordered by
    * (time, side, tiebreak), `last(payload, ignoreNulls)` — the classic
    * union-ordering formulation. ONE shuffle on the key, a sort-merge
    * within each key partition, and no data explosion: cost is
    * O((|L|+|R|) log) per partition vs the O(|L|·|R|) of a naive
    * time-inequality join. Skewed keys salt like any other shuffle key;
    * with watermarked streams the same shape runs as a stateful
    * flatMapGroupsWithState (streaming.EventStream).
    *
    * Right payload column names must not collide with left column names.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame = {
    require(rightPayload.nonEmpty, "asOf: rightPayload must name at least one column")
    val collisions = rightPayload.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"asOf: rightPayload columns ${collisions.mkString(", ")} collide with left " +
        "column names — the result would carry duplicate columns that fail on first use")
    val lrow = struct(left.columns.toSeq.map(col): _*)
    val lrowType = left.select(lrow.as("_r")).schema("_r").dataType
    val qrow = struct(rightPayload.map(col): _*)
    val qrowType = right.select(qrow.as("_q")).schema("_q").dataType
    val tbType = right.schema(rightTieBreak).dataType

    val asks = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_ask"),
      lrow.as("_r"), lit(null).cast(qrowType).as("_q"),
      lit(null).cast(tbType).as("_tb"))
    // a NULL right time can never satisfy rightTime <= leftTime, but it
    // would sort nulls-FIRST in the ascending window and become visible
    // to every ask — drop such quotes up front
    val quotes = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_ask"),
      lit(null).cast(lrowType).as("_r"), qrow.as("_q"),
      col(rightTieBreak).as("_tb"))

    // quotes sort before asks at equal time (_ask 0 < 1), so a quote AT
    // the ask's timestamp is visible (<= semantics); among equal-time
    // quotes the tiebreak orders ascending and `last` keeps the max.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_ask"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asks.unionByName(quotes)
      .withColumn("_m", last(col("_q"), ignoreNulls = true).over(w))
      .filter(col("_ask") === 1)
      .select(col("_r.*") +: rightPayload.map(p => col("_m").getField(p).as(p)): _*)
  }

  /** Interval join: pair every `points` row with every `intervals` row
    * whose [start, end] range contains the point (open/closed ends per the
    * flags). Time columns are epoch-micros longs.
    *
    * Shape: each interval explodes to the fixed-width bins it spans, each
    * point maps to its own bin, and the pairing becomes a plain equi-join
    * on (bin [+ keys]) with the exact predicate re-applied after — the
    * standard binning rewrite that turns a range condition Spark would
    * plan as BroadcastNestedLoopJoin into a shuffled hash join. A point
    * falls in exactly one bin, so no pair is produced twice. Pick
    * `binMicros` near the typical interval width: the explode factor is
    * width/bin + 1 while bin-population drives join fan-out.
    */
  def pointInInterval(
      points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binMicros: Long,
      keys: Seq[(String, String)] = Nil,
      inclusiveStart: Boolean = true, inclusiveEnd: Boolean = true): DataFrame = {
    require(binMicros > 0, "pointInInterval: binMicros must be positive")
    val iv = intervals.withColumn("_bin",
      explode(sequence(expr(s"$startCol DIV $binMicros"), expr(s"$endCol DIV $binMicros"))))
    val pt = points.withColumn("_bin", expr(s"$pointTime DIV $binMicros"))
    val joinCond = keys.foldLeft(pt("_bin") === iv("_bin")) {
      case (c, (pk, ik)) => c && pt(pk) === iv(ik)
    }
    val lower =
      if (inclusiveStart) pt(pointTime) >= iv(startCol) else pt(pointTime) > iv(startCol)
    val upper =
      if (inclusiveEnd) pt(pointTime) <= iv(endCol) else pt(pointTime) < iv(endCol)
    pt.join(iv, joinCond && lower && upper, "inner")
      .drop("_bin")
  }
}
