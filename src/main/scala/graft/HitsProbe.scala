package graft
import org.apache.spark.sql.SparkSession

/** Dev probe for the GraphSpec iters=16 HITS budget: time the identical
  * workload with and without the GraftExtensions analyzer/parser hooks, to
  * attribute analysis-time growth. Usage: runMain graft.HitsProbe [ext|noext]
  */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val withExt = args.headOption.forall(_ == "ext")
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (withExt) b.config("spark.sql.extensions", "graft.GraftExtensions") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val iters = if (args.length > 1) args(1).toInt else 16
    val cutEvery = if (args.length > 2) args(2).toInt else 4
    val e = (0L until 300L).map(i => (i % 41, (i * 11) % 41)).toDF("src", "dst")
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.hits(e, "src", "dst", iters = iters,
        cutEvery = cutEvery).collect().length
      println(f"HITSPROBE ext=$withExt iters=$iters cutEvery=$cutEvery pass=$pass rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
