package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-file commit shared by [[Tsv.writeNode]] and [[Jsonl.write]]:
  * write a 1-partition frame into a temp dir, then promote its lone
  * part-file to `dir/name` (delete-then-rename). The temp dir is removed
  * even when the write or promotion fails — each sink previously carried
  * its own copy of this dance and each leaked the temp dir on failure.
  *
  * This is load-format parity plumbing for small per-node outputs, not a
  * data path: corpus-scale writes keep their natural partition count and
  * never enter here.
  */
private[io] object SingleFile {

  /** Run `writeDir` against a temp directory under `dir`, then promote
    * the single `part-*` file it produced to `dir/name`. Returns the
    * final path. */
  def commit(conf: Configuration, dir: String, name: String)(
      writeDir: String => Unit): Path = {
    val tmp = new Path(dir, s"__tmp_$name")
    val out = new Path(dir, name)
    val fs = FileSystem.get(tmp.toUri, conf)
    try {
      writeDir(tmp.toString)
      val part = fs.listStatus(tmp)
        .map(_.getPath).find(_.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      if (fs.exists(out)) fs.delete(out, false)
      if (!fs.rename(part, out))
        throw new java.io.IOException(s"rename failed: $part -> $out")
      out
    } finally fs.delete(tmp, true)
  }
}
