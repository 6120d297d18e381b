package graft

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Test doubles for the Artifacts publish protocol (round-12 verdict
  * item 2): a Hadoop `FileSystem` whose `rename` behaves like an
  * object store's non-atomic list+copy (S3A): destination keys appear
  * ONE BY ONE in lexicographic order with an injectable pause between
  * them, so a reader can genuinely observe the half-published window
  * the protocol's marker-last design defends against. A second switch
  * makes `rename` report failure for a chosen destination, simulating
  * losing the publish race to another JVM.
  *
  * Registered under the `copyfs:` scheme via
  * `fs.copyfs.impl` = this class; everything else delegates to
  * RawLocalFileSystem so Spark's committer works unchanged.
  */
object CopyFsControl {
  /** rename destinations with this basename get the lexicographic
    * file-by-file copy with [[pauseMs]] between files. */
  @volatile var slowDirName: String = ""
  @volatile var pauseMs: Long = 0L
  /** rename destinations with this basename report failure (the
    * lost-the-publish-race case). */
  @volatile var failRenameDst: String = ""
  /** latched true when a rename was failed via [[failRenameDst]]. */
  val renameFailed = new java.util.concurrent.atomic.AtomicBoolean(false)
  def reset(): Unit = {
    slowDirName = ""; pauseMs = 0L; failRenameDst = ""
    renameFailed.set(false)
  }
}

/** A store that refuses `createNonRecursive` with an IOException whose
  * wording matches NONE of FsAtomic's unsupported-message heuristics —
  * the round-15-advice case: before the capability probe, every
  * zero-contention publish on such a connector read as a permanent
  * commit conflict. */
class RefusingCreateFileSystem extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("refusefs:///")
  override def createNonRecursive(f: Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    throw new java.io.IOException("operation refused by store")
}

class CopyRenameFileSystem extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("copyfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (dst.getName == CopyFsControl.failRenameDst) {
      CopyFsControl.renameFailed.set(true)
      return false
    }
    if (dst.getName == CopyFsControl.slowDirName) {
      // the S3A shape: no atomic move — create the destination, copy
      // keys in LEXICOGRAPHIC order (the order that would land a
      // renamed _SUCCESS before the part files), pause between keys,
      // then delete the source
      val files = listStatus(src).sortBy(_.getPath.getName)
      mkdirs(dst)
      files.foreach { st =>
        FileUtil.copy(this, st.getPath, this,
          new Path(dst, st.getPath.getName), false, getConf)
        Thread.sleep(CopyFsControl.pauseMs)
      }
      delete(src, true)
      true
    } else super.rename(src, dst)
  }
}
