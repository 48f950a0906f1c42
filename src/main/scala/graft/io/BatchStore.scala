package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** S7/S8 — the reference's batch round-trip layout against object storage
  * (`cds_transformation_functions.py:82-104` upload,
  * `:346-360` download).
  *
  * Every reference run uploads under two timestamped prefixes of a bucket:
  * the `.tsv` pipeline output under `transformed/{DATA_BATCH_NAME}/{timestamp}/`
  * and the input `.xlsx` workbooks (archived beside their derived data)
  * under `raw/{DATA_BATCH_NAME}/{timestamp}/`; the download path mirrors a
  * configured raw subfolder back to the local data folder, filtering to
  * workbooks.
  *
  * Implemented on the Hadoop FileSystem API, so every URI scheme Spark can
  * reach works by construction — `s3a://bucket` in production, `file:///`
  * in tests (which is how the layout is spec-asserted without AWS). The
  * driver-side copies are per-file (the reference's boto3 loop); the data
  * plane never routes through Spark because these are opaque small files,
  * not datasets.
  */
object BatchStore {

  /** S7: publish a finished batch. Copies the `.tsv` files of
    * `{outputFolder}/{batch}` to `{bucket}/transformed/{batch}/{timestamp}/`
    * and the `.xlsx` files of `{dataFolder}/{batch}` to
    * `{bucket}/raw/{batch}/{timestamp}/`.
    * Returns the two destination prefixes actually written. */
  def uploadBatch(
      conf: Configuration,
      outputFolder: String,
      dataFolder: String,
      batch: String,
      timestamp: String,
      bucket: String): (String, String) = {
    val transformed = new Path(s"$bucket/transformed/$batch/$timestamp")
    val raw = new Path(s"$bucket/raw/$batch/$timestamp")
    val tsvSrc = new Path(outputFolder, batch)
    val xlsxSrc = new Path(dataFolder, batch)
    // validate BOTH sources before any copy: failing between the two
    // copyMatching calls would leave a half-published timestamp prefix
    // that a retry then duplicates under a new timestamp
    for (src <- Seq(tsvSrc, xlsxSrc)) {
      require(src.getFileSystem(conf).exists(src),
        s"uploadBatch: source directory $src does not exist — nothing to publish")
    }
    copyMatching(conf, tsvSrc, transformed, ".tsv")
    copyMatching(conf, xlsxSrc, raw, ".xlsx")
    (transformed.toString, raw.toString)
  }

  /** S8: mirror `{bucket}/{rawSubfolder}`'s workbooks into
    * `{dataFolder}/{batch}/` (the reference's optional "read raw from s3"
    * entry path). Returns the local paths written. */
  def downloadBatch(
      conf: Configuration,
      bucket: String,
      rawSubfolder: String,
      dataFolder: String,
      batch: String): Seq[String] = {
    val src = new Path(s"$bucket/$rawSubfolder")
    val srcFs = src.getFileSystem(conf)
    val dst = new Path(dataFolder, batch)
    val dstFs = dst.getFileSystem(conf)
    if (!dstFs.exists(dst)) dstFs.mkdirs(dst)
    if (!srcFs.exists(src)) return Nil
    val files = srcFs.listStatus(src).filter(_.isFile).map(_.getPath)
      .filter(_.getName.endsWith(".xlsx")).sortBy(_.getName)
    files.map { p =>
      val out = new Path(dst, p.getName)
      FileUtil.copy(srcFs, p, dstFs, out, false, true, conf)
      out.toString
    }.toSeq
  }

  private def copyMatching(
      conf: Configuration, srcDir: Path, dstDir: Path, suffix: String): Unit = {
    val srcFs = srcDir.getFileSystem(conf)
    val dstFs = dstDir.getFileSystem(conf)
    // fail loudly, like the reference's os.listdir on a missing folder:
    // silently returning would hand the caller destination prefixes that
    // were never written, and the failed publish would go unnoticed
    require(srcFs.exists(srcDir),
      s"uploadBatch: source directory $srcDir does not exist — nothing to publish")
    if (!dstFs.exists(dstDir)) dstFs.mkdirs(dstDir)
    srcFs.listStatus(srcDir).filter(_.isFile).map(_.getPath)
      .filter(_.getName.endsWith(suffix)).sortBy(_.getName)
      .foreach { p =>
        FileUtil.copy(srcFs, p, dstFs, new Path(dstDir, p.getName), false, true, conf)
      }
  }
}
