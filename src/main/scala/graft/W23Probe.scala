package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run the w23 stream-stream join once and print each
  * micro-batch's durationMs breakdown + state operator metrics, so the
  * dominant cost (state store vs join vs sink) is attributed from
  * Spark's own progress telemetry instead of guessed.
  * Usage: runMain graft.W23Probe [sfDir] */
object W23Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t =>
      try Tables.load(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () })
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"W23PROBE batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} " +
          p.stateOperators.map(so =>
            s"state[rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
              s"commitMs=${so.commitTimeMs} memUsed=${so.memoryUsedBytes}]")
            .mkString(" "))
      }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("w23_stream_join")(spark, sfDir).count()
    println(f"W23PROBE total rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
