package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-manifest table format — the minimal ACID table layer
  * (Iceberg/Delta's core mechanics) on any Hadoop filesystem, built from
  * the same primitives as [[graft.state.SeenKeys]]:
  *
  *  - data files are IMMUTABLE: each commit writes its rows once under
  *    `data/delta-N/` and never touches earlier dirs;
  *  - a snapshot is a manifest FILE (`snap-N`): parent id + the list of
  *    data dirs visible at N — appends list parent's dirs plus their own;
  *  - the table state is ONE pointer (`_CURRENT`) committed by
  *    write-to-temp + `FileContext.rename(OVERWRITE)` — the atomic commit
  *    point: a reader resolves either the old snapshot or the new one,
  *    never a torn listing (no file locks, no coordination service);
  *  - TIME TRAVEL is reading any retained `snap-N` listing; because data
  *    files are immutable, a historical read costs what the snapshot cost
  *    at commit time, at 100 TB as at 100 MB.
  *
  * Single-writer discipline (concurrent committers need a CAS on the
  * pointer — object stores without atomic rename put the pointer in a
  * catalog; the DATA layout is unchanged). Readers are lock-free and
  * isolated: a long scan pinned to snapshot N is unaffected by later
  * commits, which is the property h6's time-travel filter cannot give
  * over a mutable directory.
  */
object Snapshots {

  final case class Snapshot(id: Long, parent: Option[Long], dataDirs: Seq[String])

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_CURRENT")

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  private def writeAtomic(fs: FileSystem, dir: String, name: String,
                          text: String): Unit = {
    val target = new Path(dir, name)
    val tmp = new Path(dir, s"$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, fs.getConf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(target),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def parseManifest(id: Long, text: String): Snapshot = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val parent = lines.headOption match {
      case Some(s"parent=$p") if p != "-" => Some(p.toLong)
      case _ => None
    }
    Snapshot(id, parent, lines.drop(1))
  }

  /** The current snapshot, or None for an empty/uninitialized table. */
  def current(spark: SparkSession, tableDir: String): Option[Snapshot] = {
    val fs = fsFor(spark, tableDir)
    val ptr = pointer(tableDir)
    if (!fs.exists(ptr)) None
    else get(spark, tableDir, readText(fs, ptr).trim.stripPrefix("snap-").toLong)
  }

  /** A specific retained snapshot by id. */
  def get(spark: SparkSession, tableDir: String, id: Long): Option[Snapshot] = {
    val fs = fsFor(spark, tableDir)
    val mf = new Path(tableDir, s"snap-$id")
    if (!fs.exists(mf)) None else Some(parseManifest(id, readText(fs, mf)))
  }

  /** Append `df` as a new snapshot: write `data/delta-N` (immutable),
    * write `snap-N` = parent listing + the new dir, then swing the
    * pointer atomically. Returns the new snapshot id. A crash before the
    * final rename leaves the table at the parent snapshot with only an
    * orphaned data dir to garbage-collect — never a corrupt state — and
    * the commit is RETRYABLE in place: a retry recomputes the same id
    * (the pointer never swung) and the overwrite mode replaces the
    * orphan instead of erroring on it. An id is never reused once its
    * pointer swing lands, so overwrite can only ever touch an orphan. */
  def commitAppend(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val fs = fsFor(spark, tableDir)
    val cur = current(spark, tableDir)
    val id = cur.map(_.id + 1).getOrElse(1L)
    val dataDir = s"data/delta-$id"
    df.write.mode("overwrite").parquet(new Path(tableDir, dataDir).toString)
    val dirs = cur.map(_.dataDirs).getOrElse(Nil) :+ dataDir
    val manifest =
      (s"parent=${cur.map(_.id.toString).getOrElse("-")}" +: dirs).mkString("\n")
    writeAtomic(fs, tableDir, s"snap-$id", manifest)
    writeAtomic(fs, tableDir, "_CURRENT", s"snap-$id")
    id
  }

  /** Read the table at a snapshot (default: current). Throws on an
    * unknown snapshot id or an empty table — silent empty frames would
    * mask a pointer/manifest bug. */
  def read(spark: SparkSession, tableDir: String,
           snapshotId: Option[Long] = None): DataFrame = {
    val snap = snapshotId
      .map(i => get(spark, tableDir, i).getOrElse(
        sys.error(s"no snapshot snap-$i under $tableDir")))
      .getOrElse(current(spark, tableDir).getOrElse(
        sys.error(s"empty snapshot table $tableDir")))
    spark.read.parquet(
      snap.dataDirs.map(d => new Path(tableDir, d).toString): _*)
  }
}
