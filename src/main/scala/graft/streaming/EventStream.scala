package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface for the events table (engine extension —
  * the reference is batch-only, SURVEY.md §2.8, so this is the Spark-first
  * answer to "the same pipeline, incrementally").
  *
  * Every transform here is written against a generic DataFrame so the SAME
  * code runs in batch mode (`spark.read`) and streaming mode
  * (`spark.readStream`) — Catalyst plans the incremental version with
  * state stores + watermark-based eviction when the source is streaming.
  */
object EventStream {

  /** Watermarked hourly rollup per event type: the streaming twin of the
    * batch `w2_hourly_rollup` query. Late events beyond 1h are dropped;
    * state for closed windows is evicted (bounded memory at any scale). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("cnt"), col("sum_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserStat(user_id: Long, events: Long, total_value: Double)

  /** Running per-user aggregate via mapGroupsWithState — the custom-state
    * primitive (KeyValueGroupedDataset) for semantics window aggs can't
    * express. State is one small struct per user; at scale the state store
    * shards by the grouping key across executors. */
  def userTotals(events: Dataset[Event]): Dataset[UserStat] = {
    implicit val statEnc = Encoders.product[UserStat]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, 0.0))
          var n = prev.events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserStat(user, n, tot)
          state.update(next)
          next
      }
  }

  /** Gap-based sessionization, streaming-native: `session_window` merges
    * events within `gap` of each other into one growing window per user —
    * the incremental twin of the batch w3 query's lag/cumsum construction,
    * with watermark-bounded state (a session closes, emits, and evicts
    * once the watermark passes its end; no unbounded per-user state). Runs
    * identically in batch mode. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on content keys — the incremental twin of the
    * batch d1 hash-groupBy and the cross-RUN [[graft.state.SeenKeys]]:
    * `dropDuplicatesWithinWatermark` keeps one state entry per key only
    * until the watermark passes it, so state is bounded by the key arrival
    * rate × horizon, not by stream lifetime (at 100 TB/day the horizon is
    * the dial between memory and dedup reach; beyond-horizon dedup is
    * SeenKeys' job between runs). */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  eventTimeCol: String = "ts", horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(keys)

  final case class Tick(k: Long, t: Timestamp, isAsk: Boolean, id: Long,
                        payload: Double)
  final case class AsOfMatch(k: Long, ask_id: Long, t: Timestamp,
                             quote_id: Option[Long], quote_t: Option[Timestamp],
                             quote_payload: Option[Double])
  final case class BestQuote(t: Timestamp, id: Long, payload: Double)

  /** Streaming twin of [[graft.ops.TemporalJoin.asOf]]: asks match the
    * latest quote at or before their event time, keyed, ties broken by the
    * highest quote id. State is ONE BestQuote struct per key — bounded by
    * the key cardinality, not the stream length (the batch form's window
    * sort becomes "keep the max-(t, id) quote seen").
    *
    * Ordering contract: events are sorted by (t, side, id) WITHIN each
    * micro-batch group, so intra-batch disorder is absorbed exactly; a
    * quote arriving in a LATER batch than an ask it should have matched is
    * past the horizon and cannot retro-match (the same late-data line a
    * watermark draws — stream-stream interval joins are the heavyweight
    * alternative when retro-matching matters). Symmetrically, the state
    * keeps only the single best (latest) quote per key: an ask arriving in
    * a later batch than a NEWER quote cannot fall back to an older quote
    * it would have matched in batch mode — time-travelling asks are also
    * outside the contract (keep per-time-band state, or use the batch
    * [[graft.ops.TemporalJoin.asOf]], when they matter). */
  def asOfStream(ticks: Dataset[Tick]): Dataset[AsOfMatch] = {
    implicit val outEnc = Encoders.product[AsOfMatch]
    implicit val stEnc = Encoders.product[BestQuote]
    implicit val keyEnc = Encoders.scalaLong
    ticks
      .groupByKey(_.k)
      .flatMapGroupsWithState[BestQuote, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (k: Long, batch: Iterator[Tick], state: GroupState[BestQuote]) =>
          // quotes sort before asks at equal t (same visibility rule as the
          // batch operator); among equal-t quotes the higher id wins
          val evs = batch.toSeq.sortBy(e => (e.t.getTime, e.isAsk, e.id))
          var best = state.getOption
          val out = Seq.newBuilder[AsOfMatch]
          evs.foreach { e =>
            if (!e.isAsk) {
              if (best.forall(b =>
                (e.t.getTime > b.t.getTime) ||
                  (e.t.getTime == b.t.getTime && e.id > b.id)))
                best = Some(BestQuote(e.t, e.id, e.payload))
            } else {
              val m = best.filter(_.t.getTime <= e.t.getTime)
              out += AsOfMatch(k, e.id, e.t, m.map(_.id), m.map(_.t), m.map(_.payload))
            }
          }
          best.foreach(state.update)
          out.result().iterator
      }
  }

  /** Convenience: start `hourlyRollup` over a parquet directory source
    * into an in-memory sink (smoke/demo path; production would write a
    * parquet/kafka sink with a checkpoint dir). Update mode: Append over
    * a watermarked aggregation only emits windows the watermark has
    * CLOSED, so a static directory would yield a permanently empty table
    * — for a demo sink, emit current aggregate values per trigger. */
  def startRollupToMemory(
      spark: org.apache.spark.sql.SparkSession,
      sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    hourlyRollup(stream)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
  }
}
