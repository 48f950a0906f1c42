package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared listing for b<id>-keyed state-delta directories (the
  * overwrite-idempotent per-batch delta layout every graft stream
  * uses). `onlyCommitted = true` (the read-side default) admits only
  * dirs carrying Spark's `_SUCCESS` marker: a delta torn by a crash
  * mid-write is INVISIBLE to folds — the checkpoint replays its batch
  * and overwrites it before any later batch runs — instead of being
  * silently read as zero/partial rows (or, worse, baked into a
  * compacted base and then retired past repair). GC-side callers list
  * with `onlyCommitted = false` so torn dirs remain reclaimable. */
private[streaming] object StateDirs {

  def deltas(spark: SparkSession, dir: String,
             onlyCommitted: Boolean = true): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b") &&
        st.getPath.getName.drop(1).forall(_.isDigit))
      .filter(st => !onlyCommitted ||
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(st => (st.getPath.getName.drop(1).toLong, st.getPath.toString))
  }
}
