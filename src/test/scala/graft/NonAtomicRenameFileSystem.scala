package graft

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Object-store rename emulation for CatalogSpec: every `rename` is
  * copy-then-delete — O(data), NON-atomic, a reader can observe the
  * half-moved state — which is exactly how the S3A/GCS connectors
  * emulate directory rename (neither store has one). Nesting semantics
  * are preserved: renaming onto an existing directory copies the source
  * INSIDE it, like local/HDFS rename, so the commit protocol's
  * claim-loss path (ownership marker not visible at the target root)
  * exercises identically. Registered under the `nonatomic://` scheme
  * via `fs.nonatomic.impl`.
  */
class NonAtomicRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    val target =
      if (exists(dst) && getFileStatus(dst).isDirectory) new Path(dst, src.getName)
      else dst
    if (exists(target)) return false
    // file-by-file copy, then source delete: the non-atomic window an
    // object store has and a posix/HDFS rename does not
    FileUtil.copy(this, src, this, target, false, getConf) && delete(src, true)
  }
}
