package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Components, Pack, TemporalJoin}
import graft.state.History
import graft.ext.{TextAnalysis, TextDedup}

/** Round-5 operators: as-of join, interval join, sequence packing,
  * upsert-latest, stratified sampling, repetition, contamination. Small
  * fixtures pinning the exact semantics the DuckDB oracles encode
  * (tie-breaks, boundary inclusivity, prefix offsets). */
class TemporalPackSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------ TemporalJoin.asOf

  test("asOf picks latest quote <= ask time, ties broken by max tiebreak") {
    val asks = Seq(
      (1L, 10L, ts("2024-01-01 00:00:10")),
      (2L, 10L, ts("2024-01-01 00:00:05")),
      (3L, 20L, ts("2024-01-01 00:00:10")), // key with no quotes at all
      (4L, 10L, ts("2024-01-01 00:00:01")) // before every quote
    ).toDF("ask_id", "k", "at")
    val quotes = Seq(
      (100L, 10L, ts("2024-01-01 00:00:05"), "a"),
      (101L, 10L, ts("2024-01-01 00:00:05"), "b"), // same ts: 101 wins by id
      (102L, 10L, ts("2024-01-01 00:00:09"), "c")
    ).toDF("q_id", "k", "q_at", "payload")

    val out = TemporalJoin.asOf(asks, quotes, "k", "k", "at", "q_at",
        rightPayload = Seq("q_id", "payload"), rightTieBreak = "q_id")
      .orderBy("ask_id")
      .select("ask_id", "q_id", "payload").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("-")))

    assert(out.toSeq == Seq(
      (1L, 102L, "c"), // latest quote at :09
      (2L, 101L, "b"), // quote AT ask time visible; tie -> max q_id
      (3L, -1L, "-"), // no quotes for key 20
      (4L, -1L, "-") // all quotes after the ask
    ))
  }

  test("asOf emits exactly one row per left row") {
    val asks = Seq((1L, 1L, ts("2024-01-01 00:00:10"))).toDF("ask_id", "k", "at")
    val quotes = Seq(
      (9L, 1L, ts("2024-01-01 00:00:01"), "x"),
      (8L, 1L, ts("2024-01-01 00:00:02"), "y")).toDF("q_id", "k", "q_at", "p")
    val out = TemporalJoin.asOf(asks, quotes, "k", "k", "at", "q_at", Seq("p"), "q_id")
    assert(out.count() == 1)
    assert(out.select("p").as[String].head() == "y")
  }

  // --------------------------------------------- TemporalJoin.pointInInterval

  test("pointInInterval finds pairs across bin boundaries, honors endpoints") {
    // bin = 10; interval [8, 22] spans bins 0..2
    val points = Seq((1L, 8L), (2L, 9L), (3L, 15L), (4L, 22L), (5L, 23L))
      .toDF("p_id", "p_t")
    val intervals = Seq((100L, 8L, 22L)).toDF("iv_id", "s_t", "e_t")

    def ids(inclS: Boolean, inclE: Boolean): Seq[Long] =
      TemporalJoin.pointInInterval(points, "p_t", intervals, "s_t", "e_t",
          binMicros = 10L, inclusiveStart = inclS, inclusiveEnd = inclE)
        .select("p_id").as[Long].collect().sorted.toSeq

    assert(ids(true, true) == Seq(1L, 2L, 3L, 4L))
    assert(ids(false, true) == Seq(2L, 3L, 4L))
    assert(ids(true, false) == Seq(1L, 2L, 3L))
    assert(ids(false, false) == Seq(2L, 3L))
  }

  test("pointInInterval produces each qualifying pair exactly once and honors keys") {
    val points = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("p_id", "pk", "p_t")
    val intervals = Seq((10L, "a", 0L, 100L), (11L, "b", 50L, 100L))
      .toDF("iv_id", "ik", "s_t", "e_t")
    val out = TemporalJoin.pointInInterval(points, "p_t", intervals, "s_t", "e_t",
        binMicros = 7L, keys = Seq("pk" -> "ik"))
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq
    // point 1 matches only its key's interval; point 2's key interval starts later
    assert(out == Seq((1L, 10L)))
  }

  // ------------------------------------------------------- Pack.packSequences

  test("packSequences matches the sequential prefix-sum reference across partitionings") {
    val docs = (1L to 97L).map(i => (i, (i % 7) + 1)) // irregular token counts
    val expectedPrior = docs.scanLeft(0L)(_ + _._2).init
    val expected = docs.zip(expectedPrior).map { case ((id, tk), prior) =>
      (id, tk, prior, prior / 10)
    }
    for (parts <- Seq(1, 3, 8, 50, 200)) { // > #rows exercises empty buckets
      val out = Pack.packSequences(docs.toDF("id", "tok"), "id", "tok",
          budget = 10L, buckets = parts)
        .select("id", "tok", "prior", "pack_id")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(out == expected, s"partitions=$parts")
    }
  }

  test("packSequences: empty input yields empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "tok")
    assert(Pack.packSequences(empty, "id", "tok", budget = 10L).count() == 0)
  }

  test("balancedShards: total partition, balanced counts, partition-invariant") {
    // sizes span several 50-wide buckets; keys deliberately unsorted
    val rows = (1L to 103L).map(i => (i * 37 % 103, (i * 13 % 200) + 1))
    val df = rows.toDF("k", "sz")
    val out = Pack.balancedShards(df, "k", "sz", nShards = 4, bucketWidth = 50)
    assert(out.count() == 103)
    val perShard = out.groupBy("shard_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perShard.keySet.subsetOf((0L until 4L).toSet))
    // round-robin within each bucket -> shard counts differ by at most
    // (#buckets) across shards
    val nBuckets = rows.map(_._2 / 50).distinct.size
    assert(perShard.values.max - perShard.values.min <= nBuckets.toLong,
      s"imbalance: $perShard")
    // deterministic under repartitioning
    val out2 = Pack.balancedShards(df.repartition(7), "k", "sz", 4, 50)
      .select("k", "shard_id").as[(Long, Long)].collect().toSet
    assert(out.select("k", "shard_id").as[(Long, Long)].collect().toSet == out2)
  }

  // ---------------------------------------------------- History.upsertLatest

  test("asOf ignores quotes with a NULL time (they can never satisfy <=)") {
    val asks = Seq((1L, 10L, "ask1")).toDF("k", "t", "tag")
    val quotes = Seq(
      (1L, Option.empty[Long], 99.0, 1L), // null-time quote: invisible
      (1L, Some(20L), 50.0, 2L))          // future quote: also no match
      .toDF("k", "t", "px", "qid")
    val out = TemporalJoin.asOf(asks, quotes, "k", "k", "t", "t",
      rightPayload = Seq("px"), rightTieBreak = "qid").collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("px")),
      s"null-time quote leaked into the as-of match: ${out.toSeq}")
  }

  test("upsertLatest: updated flags the key HAVING an update, even a null-valued one") {
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val updates = Seq((1L, Option.empty[Double], 5L)).toDF("uk", "uv", "ts")
    val out = History.upsertLatest(base, "k", "v", updates, "uk", "uv",
        orderCols = Seq("ts"))
      .select("k", "current_value", "updated")
      .as[(Long, Double, Long)].collect()
      .map { case (k, v, u) => k -> ((v, u)) }.toMap
    // key 1 had an update (value null): flag 1, value falls back to base
    assert(out(1L) == (10.0, 1L))
    assert(out(2L) == (20.0, 0L))
  }

  test("upsertLatest takes max (ts, tiebreak) update, falls back to base value") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val updates = Seq(
      (1L, 111.0, ts("2024-01-01 00:00:05"), 1L),
      (1L, 222.0, ts("2024-01-01 00:00:09"), 2L), // latest for k=1
      (2L, 333.0, ts("2024-01-01 00:00:05"), 3L),
      (2L, 444.0, ts("2024-01-01 00:00:05"), 4L) // same ts: id 4 wins
    ).toDF("uk", "uv", "uts", "uid")
    val out = History.upsertLatest(base, "k", "v", updates, "uk", "uv",
        orderCols = Seq("uts", "uid"))
      .select("k", "current_value", "updated")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 222.0, 1L), (2L, 444.0, 1L), (3L, 30.0, 0L)))
  }

  test("snapshotDiff: null-safe classification over a compound key") {
    val old = Seq(
      (1L, "a", Option(10.0)),        // unchanged → dropped
      (1L, "b", Option(10.0)),        // value changes → update
      (2L, "a", Option.empty[Double]),// null → null: unchanged, dropped
      (2L, "b", Option(5.0)),         // gone from new → delete
      (3L, "a", Option.empty[Double]) // null → value: update (null-safe)
    ).toDF("k1", "k2", "v")
    val neu = Seq(
      (1L, "a", Option(10.0)),
      (1L, "b", Option(11.0)),
      (2L, "a", Option.empty[Double]),
      (3L, "a", Option(7.0)),
      (9L, "z", Option(1.0))          // new only → insert
    ).toDF("k1", "k2", "v")
    val out = History.snapshotDiff(old, neu, key = Seq("k1", "k2"),
        compare = Seq("v"))
      .select("k1", "k2", "op").as[(Long, String, String)]
      .collect().map { case (a, b, op) => (a, b) -> op }.toMap
    assert(out == Map(
      (1L, "b") -> "update", (2L, "b") -> "delete",
      (3L, "a") -> "update", (9L, "z") -> "insert"), s"got $out")
  }

  // ------------------------------------------- stratified sample + curation

  test("stratifiedSampleFilter: lower-rate sample is a subset of higher-rate") {
    val docs = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("id", "lang")
    def sample(rEn: Double, rDef: Double): Set[Long] = docs
      .filter(TextAnalysis.stratifiedSampleFilter(col("lang"), col("id"),
        Map("en" -> rEn), rDef))
      .select("id").as[Long].collect().toSet
    val low = sample(0.2, 0.05)
    val high = sample(0.6, 0.3)
    assert(low.subsetOf(high)) // thresholds nest per (stratum, key)
    assert(low.nonEmpty && high.size < 400)
  }

  test("repetitionStats counts n-gram multiplicity; 1-word doc floors to one gram") {
    val docs = Seq(
      (1L, "a b a b a b"), // bigrams: (a b)x3 (b a)x2 -> 5 total, 2 distinct
      (2L, "x y z"), // all distinct
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 2)
      .select("doc_id", "n_grams", "n_distinct", "rep_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 5L, 2L, 6000L), // 1 - 2/5 = 0.6
      (2L, 2L, 2L, 0L),
      (3L, 1L, 1L, 0L)))
  }

  // -------------------------------------------------- Components.connected

  test("connected components: chain (diameter 3), pair, singleton vertex") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val out = Components.connected(edges, "a", "b", Some(verts), "id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connected components: edge endpoints are vertices even without a vertex frame") {
    val edges = Seq((5L, 7L), (7L, 6L)).toDF("a", "b")
    val out = Components.connected(edges, "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("connected components: empty edges yield singleton components") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val verts = Seq(1L, 2L).toDF("id")
    val out = Components.connected(edges, "a", "b", Some(verts), "id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(1L -> 1L, 2L -> 2L))
  }

  test("scd2 chains validity intervals per key; latest version stays open") {
    val ch = Seq(
      (1L, 10L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 11L, "b", java.sql.Timestamp.valueOf("2024-01-03 00:00:00")),
      (1L, 12L, "c", java.sql.Timestamp.valueOf("2024-01-03 00:00:00")), // same ts: id orders
      (2L, 20L, "x", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
      .toDF("k", "ev", "attr", "ts")
    val out = History.scd2(ch, "k", "ts", "ev")
      .select("ev", "valid_from", "valid_to")
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), Option(r.getTimestamp(2)))).toMap
    assert(out(10L)._2.contains(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
    assert(out(11L)._2.contains(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))) // closed by ev 12
    assert(out(12L)._2.isEmpty) // current version
    assert(out(20L)._2.isEmpty) // singleton key
    assert(out(10L)._1 == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("connected components: maxIter == diameter converges (confirmation round is free)") {
    // chain 1-2-3 has diameter 2; labels finalize in round 2 and the
    // extra confirmation round must OBSERVE that instead of throwing
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Components.connected(edges, "a", "b", maxIter = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connected components: non-convergence within maxIter fails loudly, not silently") {
    // a 6-node chain has diameter 5; hash-min needs >2 rounds to converge
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Components.connected(edges, "a", "b", maxIter = 2).count()
    }
    assert(ex.getMessage.contains("did not converge"))
    // opting out returns the (refinement) labels instead of throwing
    val relaxed = Components.connected(edges, "a", "b", maxIter = 2,
      requireConvergence = false)
    assert(relaxed.count() == 6)
  }

  test("packAtomic: next-fit fold, bucket seams, oversized isolation, partition-stable") {
    import graft.ops.Pack
    // one bucket (buckets=1): 4+5 fit 10, 3 opens pack 1, 9 opens pack 2,
    // oversized 12 opens its own pack and flags, 2 cannot join it (12>10
    // fills past budget) so it opens pack 4
    val docs = Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 9L), (5L, 12L), (6L, 2L))
      .toDF("id", "tok")
    val out = Pack.packAtomic(docs, "id", "tok", budget = 10L, buckets = 1)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 4L, 0L, 0L, 0L), (2L, 5L, 0L, 0L, 0L),
      (3L, 3L, 0L, 1L, 0L), (4L, 9L, 0L, 2L, 0L),
      (5L, 12L, 0L, 3L, 1L), (6L, 2L, 0L, 4L, 0L)))
    // atomicity + budget invariants on a larger random corpus, and the
    // assignment must not depend on the input partitioning
    val rnd = new scala.util.Random(77L)
    val big = (1L to 400L).map(i => (i, 1L + rnd.nextInt(300).toLong))
    val a = Pack.packAtomic(big.toDF("id", "tok"), "id", "tok", 512L, buckets = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = Pack.packAtomic(big.toDF("id", "tok").repartition(13), "id", "tok",
        512L, buckets = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b, "packing must be partitioning-independent")
    val byPack = a.groupBy(t => (t._3, t._4))
    assert(byPack.values.forall(_.map(_._2).sum <= 512L),
      "no pack may exceed the budget")
    assert(a.map(_._1).size == 400, "every doc packed exactly once")
    // next-fit invariant: within a bucket, consecutive packs could not
    // have merged (fill + next pack's first doc > budget)
    for (((bkt, pk), rows) <- byPack; next <- byPack.get((bkt, pk + 1))) {
      val fill = rows.map(_._2).sum
      val firstNext = next.toSeq.minBy(_._1)._2
      assert(fill + firstNext > 512L,
        s"bucket $bkt pack $pk could have absorbed the next pack's head")
    }
  }

  test("star-contraction: path graph beyond hash-min's bound converges in O(log) rounds") {
    // a 300-edge path has diameter 300 — hash-min at the DEFAULT
    // maxIter=20 must die loudly (er4's sorted-neighborhood chains are
    // the realistic producer of this shape) ...
    val edges = (1L to 300L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Components.connected(edges, "a", "b").count()
    }
    assert(ex.getMessage.contains("did not converge"))
    // ... while star contraction converges well inside the same default
    // bound and labels the whole chain with its minimum
    val out = Components.connected(edges, "a", "b",
        algo = Components.StarContraction)
      .as[(Long, Long)].collect().toSeq
    assert(out.length == 301 && out.forall(_._2 == 1L))
  }

  test("star-contraction matches hash-min on 30 random graphs + edge cases") {
    val rnd = new scala.util.Random(1313L)
    for (trial <- 1 to 30) {
      val n = rnd.nextInt(20) + 2
      val edges = (1 to rnd.nextInt(25))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val verts = (0 until n).map(_.toLong).toDF("id")
      val ref = Components.connected(
          if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
          else edges.toDF("a", "b"),
          "a", "b", vertices = Some(verts), idCol = "id", maxIter = n + 1)
        .as[(Long, Long)].collect().toMap
      val star = Components.connected(
          if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
          else edges.toDF("a", "b"),
          "a", "b", vertices = Some(verts), idCol = "id",
          algo = Components.StarContraction)
        .as[(Long, Long)].collect().toMap
      assert(star == ref, s"trial $trial: n=$n edges=$edges")
    }
    // empty edges + self-loop-only edges: singletons either way
    val selfy = Seq((3L, 3L)).toDF("a", "b")
    val got = Components.connected(selfy, "a", "b",
        vertices = Some(Seq(3L, 4L).toDF("id")), idCol = "id",
        algo = Components.StarContraction)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(3L -> 3L, 4L -> 4L))
  }

  test("as-of join rejects payload names that collide with left columns") {
    val asks = Seq((1L, 10L, "x")).toDF("k", "t", "payload")
    val quotes = Seq((1L, 5L, "q", 1L)).toDF("k", "t", "payload", "qid")
    val ex = intercept[IllegalArgumentException] {
      TemporalJoin.asOf(asks, quotes, "k", "k", "t", "t",
        rightPayload = Seq("payload"), rightTieBreak = "qid")
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("asOf matches a brute-force reference on 30 randomized tick sets") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 30) {
      val nq = rnd.nextInt(12); val na = rnd.nextInt(12) + 1
      // coarse time grid (0..9 seconds) to force plenty of equal-ts ties
      def t(): java.sql.Timestamp = ts(f"2024-01-01 00:00:0${rnd.nextInt(10)}")
      val quotes = (1 to nq).map(i => (100L + i, rnd.nextInt(3).toLong, t(), s"p$i"))
      val asks = (1 to na).map(i => (i.toLong, rnd.nextInt(3).toLong, t()))
      val expected = asks.map { case (aid, k, at) =>
        val best = quotes.filter(q => q._2 == k && !q._3.after(at))
          .sortBy(q => (q._3.getTime, q._1)).lastOption
        aid -> best.map(_._1)
      }.toMap
      val out = TemporalJoin.asOf(
          asks.toDF("ask_id", "k", "at"),
          quotes.toDF("q_id", "k", "q_at", "p"),
          "k", "k", "at", "q_at", Seq("q_id", "p"), "q_id")
        .select("ask_id", "q_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(out == expected, s"trial $trial: asks=$asks quotes=$quotes")
    }
  }

  test("connected components match union-find on 30 random graphs") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 30) {
      val n = rnd.nextInt(20) + 2
      val edges = (1 to rnd.nextInt(25))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference (min-id labeling)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map { v =>
        // min vertex id in the component = the root under min-union
        v.toLong -> find(v).toLong
      }.toMap
      val verts = (0 until n).map(_.toLong).toDF("id")
      val got =
        if (edges.isEmpty) verts.select(col("id"), col("id").as("component"))
          .as[(Long, Long)].collect().toMap
        else Components.connected(edges.toDF("a", "b"), "a", "b",
          vertices = Some(verts), idCol = "id", maxIter = n + 1)
          .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("gapFill: grid spans each key's range, ffill carries, flags mark gaps") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:30:00"), 1.0),
      (1L, ts("2024-01-01 00:45:00"), 2.0), // same bucket: max wins
      (1L, ts("2024-01-01 03:15:00"), 5.0), // 2-hour gap before this
      (2L, ts("2024-01-01 10:00:00"), 9.0)  // single-bucket key: no grid
    ).toDF("user_id", "ts", "value")
    val out = graft.ops.Resample.gapFill(ev, "user_id", "ts", "value")
      .select("user_id", "bucket_ts", "value", "was_gap")
      .as[(Long, java.sql.Timestamp, Double, Int)]
      .collect().map(r => (r._1, r._2.toString) -> ((r._3, r._4))).toMap
    assert(out.size == 5)
    assert(out((1L, "2024-01-01 00:00:00.0")) == (2.0, 0)) // bucket max
    assert(out((1L, "2024-01-01 01:00:00.0")) == (2.0, 1)) // filled
    assert(out((1L, "2024-01-01 02:00:00.0")) == (2.0, 1)) // filled
    assert(out((1L, "2024-01-01 03:00:00.0")) == (5.0, 0))
    assert(out((2L, "2024-01-01 10:00:00.0")) == (9.0, 0))
  }

  test("representatives: preference order wins, singletons rep themselves") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b") // {1,2,3} + lone 4
    val attrs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 7L)).toDF("id", "len")
    val labels = Components.connected(edges, "a", "b",
      vertices = Some(attrs.select("id")), idCol = "id")
    val out = Components.representatives(labels, attrs, "id",
        order = Seq(col("len").desc, col("id")))
      .as[(Long, Long, Long)].collect().toSet
    // cluster 1: len ties 2 vs 3 at 9 -> id 2 wins; singleton 4 keeps itself
    assert(out == Set((1L, 2L, 3L), (4L, 4L, 1L)), s"got $out")
  }

  test("scd2 intervals partition each key's timeline: chained, one open version") {
    val rnd = new scala.util.Random(7L)
    val changes = (1 to 200).map { i =>
      (i.toLong, rnd.nextInt(8).toLong, ts(f"2024-01-01 00:00:0${rnd.nextInt(10)}"))
    }
    val out = History.scd2(changes.toDF("ev", "k", "at"), "k", "at", "ev")
      .select("k", "ev", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(out.length == changes.length) // every change becomes a version
    out.groupBy(_._1).foreach { case (k, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._2))
      // exactly the last version is open; each valid_to chains to the
      // next version's valid_from
      ordered.init.zip(ordered.tail).foreach { case (cur, next) =>
        assert(cur._4.contains(next._3), s"key $k: broken chain at $cur -> $next")
      }
      assert(ordered.last._4.isEmpty, s"key $k: last version not open")
    }
  }

  test("contamination scores overlap against the benchmark set only") {
    val docs = Seq(
      (10L, "the quick brown fox jumps"), // benchmark (isBench)
      (1L, "the quick brown fox sleeps"), // shares trigram "the quick brown"
      (2L, "totally different words here five") // no overlap -> absent
    ).toDF("doc_id", "text")
    val out = TextDedup.contamination(docs, "doc_id", "text",
        isBenchmark = col("doc_id") === 10L, n = 3)
      .select("doc_id", "n_shingles", "n_overlap")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: trigrams {the quick brown, quick brown fox, brown fox sleeps};
    // first two occur in the benchmark doc
    assert(out == Seq((1L, 3L, 2L)))
  }

  test("bloomContamination is row-identical to the exact contamination tier") {
    // 200 docs over a 40-word vocabulary so benchmark/corpus trigram
    // overlap is dense and the Bloom prescreen sees real members, real
    // absentees, and (at fpp 0.01) possibly false positives the verify
    // join must remove
    val words = (0 until 40).map(i => s"w$i")
    val docs = (0 until 200).map { d =>
      // 7 shared-content classes (each contains benchmark multiples of 10,
      // so candidates overlap partially via the class prefix); docs with
      // d % 13 == 3 get fully unique text and must be absent from output
      val toks =
        if (d % 13 == 3) (0 until 12).map(j => s"x${d}_$j")
        else (0 until 12).map(j => words((d % 7 * 5 + j) % words.length)) :+ s"u$d"
      (d.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val isBench = pmod(col("doc_id"), lit(10)) === 0
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val exact = TextDedup.contamination(docs, "doc_id", "text", isBench, n = 3)
      .collect().map(key).toSet
    val bloom = TextDedup.bloomContamination(docs, "doc_id", "text", isBench, n = 3)
      .collect().map(key).toSet
    assert(exact.nonEmpty && bloom == exact)
  }

  test("bloom prescreen kernel: no false negatives, fpp near spec") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 1000L).foreach(bf.putLong)
    val probes = spark.range(0, 5000).toDF("v")
    val hits = probes
      .filter(graft.functions.VectorExpressions.bloomMightContainLong(col("v"), bf))
      .select("v").as[Long].collect().toSet
    // one-sided error: every member answers true
    assert((0L until 1000L).forall(hits.contains))
    // false positives among the 4000 absent probes stay near the 1% spec
    // (expected ~40; 400 is > 20 sigma out — deterministic in practice)
    assert((hits -- (0L until 1000L)).size < 400)
  }
}
