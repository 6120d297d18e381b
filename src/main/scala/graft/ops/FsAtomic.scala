package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Marker-file primitives shared by the two publish protocols
  * (SnapshotTable's `_COMMITTED`, Artifacts' `_SUCCESS`). Both gate
  * readers on a marker created AFTER the data is in place, so the one
  * failure mode they must rule out is marker RESURRECTION: a plain
  * `fs.create(marker)` re-creates missing parent dirs, so a publisher
  * whose dir was deleted under it (a concurrent healer reclaiming what
  * it judged a corpse) would silently re-create the dir and publish an
  * empty marker-gated artifact. `createNonRecursive` fails instead —
  * but not every Hadoop FileSystem implements it (the base-class
  * default and several connectors throw IOException), so mapping every
  * IOException to "marker taken" would turn ZERO-contention commits
  * into permanent conflicts on such stores. This helper distinguishes
  * the two: unsupported-operation falls back to an exists-gated plain
  * create (a narrower but still-present resurrection window, the best
  * the store offers), while a genuine create failure stays loud. */
private[graft] object FsAtomic {

  private def unsupported(e: java.io.IOException): Boolean = {
    val m = Option(e.getMessage).getOrElse("").toLowerCase
    m.contains("unsupported") || m.contains("not support") ||
      m.contains("not implemented")
  }

  /** Create `marker` exclusively WITHOUT re-creating missing parents.
    * Throws IllegalStateException when the marker already exists, the
    * parent dir vanished, or the store refused the create — the caller
    * maps that to its publish-conflict semantics. */
  def createMarkerExclusive(fs: FileSystem, marker: Path,
      what: String): Unit = {
    def fail(detail: String): Nothing =
      throw new IllegalStateException(
        s"$what: marker $marker not creatable ($detail)")
    def fallback(): Unit = {
      // stores without createNonRecursive: gate on explicit checks —
      // the residual window (parent deleted between exists and create)
      // is documented, not silent
      if (!fs.exists(marker.getParent)) fail("parent dir vanished")
      if (fs.exists(marker)) fail("already taken")
      try fs.create(marker, false).close()
      catch { case e: java.io.IOException =>
        fail(s"taken, or the dir vanished: ${e.getMessage}")
      }
    }
    try fs.createNonRecursive(marker, false, 4096,
      fs.getDefaultReplication(marker), fs.getDefaultBlockSize(marker),
      null).close()
    catch {
      case _: UnsupportedOperationException => fallback()
      case e: java.io.IOException if unsupported(e) => fallback()
      case e: java.io.IOException =>
        fail(s"taken, or the dir vanished: ${e.getMessage}")
    }
  }

  /** Best-effort mtime refresh (age-gated sweeps read dir mtimes; a
    * store may reject setTimes on dirs with either exception type). */
  def touch(fs: FileSystem, p: Path): Unit =
    try fs.setTimes(p, System.currentTimeMillis(), -1)
    catch {
      case _: java.io.IOException => ()
      case _: UnsupportedOperationException => ()
    }
}
