package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.ops.Snapshots

/** Round-18 probe for the MANIFEST-SCALE read path: how does the
  * snapshot read's logical plan grow with the number of delta dirs?
  * Before round 18 [[Snapshots.read]] built one DataFrame per data dir
  * and folded with unionByName — an O(dirs) plan whose ANALYSIS time
  * (driver-side, per query) grows linearly even when pruning opens few
  * dirs; a year of hourly commits (~9k deltas) turns every query into
  * a driver bottleneck. The grouped scan batches consecutive dirs that
  * share a delete horizon + schema-op set into ONE multi-path parquet
  * relation, so the plan is O(delete commits + schema ops), not
  * O(appends).
  *
  * Usage: `runMain graft.ManifestScaleProbe [nAppends] [nDeletes]`
  * (defaults 2000, 3). Prints, for the assembled table:
  *   - commit wall time (context, not the subject),
  *   - read() plan CONSTRUCTION+ANALYSIS time,
  *   - optimized-plan node count and FileSourceScan relation count,
  *   - full count() wall time,
  *   - the same for a readPruned slice.
  * BASELINE.md pins the numbers. */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val nDel = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-manifest-scale-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files
      .createTempDirectory("manifest_scale").toString
    val t0 = System.nanoTime()
    // n tiny appends with stats on k (the hourly-commit shape), a few
    // deletes sprinkled through so the horizon actually splits runs
    val delEvery =
      if (nDel <= 0) Int.MaxValue else math.max(1, n / (nDel + 1))
    (0 until n).foreach { i =>
      Snapshots.commitAppendStats(
        Seq((i.toLong, s"row$i")).toDF("k", "v"), root, "k")
      if (i > 0 && i % delEvery == 0)
        Snapshots.commitDelete(Seq(Tuple1(i.toLong - 1)).toDF("k"),
          root, "k")
    }
    val commitSec = (System.nanoTime() - t0) / 1e9

    def probe(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val a0 = System.nanoTime()
      val df = mk
      val analyzed = df.queryExecution.optimizedPlan // forces analysis
      val nodes = analyzed.collect { case p => p }.size
      val planSec = (System.nanoTime() - a0) / 1e9
      val scans = analyzed.collect { case l: LogicalRelation => l }.size
      val c0 = System.nanoTime()
      val rows = df.count()
      val countSec = (System.nanoTime() - c0) / 1e9
      println(f"$label%-12s plan=$planSec%8.3fs nodes=$nodes%5d " +
        f"scans=$scans%4d count=$rows%7d in $countSec%8.3fs")
    }

    println(f"table: $n appends + $nDel deletes, commit wall " +
      f"$commitSec%.1fs ($root)")
    probe("read")(Snapshots.read(spark, root))
    probe("read(2nd)")(Snapshots.read(spark, root))
    probe("readPruned")(
      Snapshots.readPruned(spark, root, "k", n / 2L, n / 2L + 99L))
    spark.stop()
  }
}
