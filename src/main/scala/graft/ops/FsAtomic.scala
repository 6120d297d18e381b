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

  /** Per-FileSystem-class verdict on whether createNonRecursive works
    * at all, learned by an explicit PROBE (round-15 advice: deciding
    * from IOException message substrings alone turns every
    * zero-contention publish on a differently-worded connector into a
    * permanent commit conflict). Cached by class: capability is a
    * property of the implementation, not the path. */
  private val nonRecursiveSupport =
    new java.util.concurrent.ConcurrentHashMap[Class[_],
      java.lang.Boolean]()

  /** Ground-truth probe: try createNonRecursive on a fresh throwaway
    * name next to `near` (same store, parent known to exist at probe
    * time). Some(true) = the call works (a later IOException from the
    * REAL marker create is a genuine conflict); Some(false) = the store
    * definitively refuses it (UnsupportedOperationException, or an
    * IOException worded as unsupported). A plain IOException is
    * AMBIGUOUS — throttling or a network blip, not capability — and
    * returns None so the verdict is NEVER cached (round-16 advice:
    * caching a transient error as "unsupported" permanently downgraded
    * every future marker create on that store to the non-atomic
    * fallback, widening the resurrection window this helper closes). */
  private def probeNonRecursive(fs: FileSystem,
      near: Path): Option[Boolean] = {
    val p = new Path(near.getParent,
      s".graft-cap-probe-${java.util.UUID.randomUUID()}")
    try {
      fs.createNonRecursive(p, false, 4096,
        fs.getDefaultReplication(p), fs.getDefaultBlockSize(p),
        null).close()
      fs.delete(p, false)
      Some(true)
    } catch {
      case _: UnsupportedOperationException => Some(false)
      case e: java.io.IOException =>
        if (unsupported(e)) Some(false) else None
    }
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
      case e: java.io.IOException =>
        // ambiguous: "not implemented" or a genuine conflict? The
        // message heuristic is only a fast path — the cached per-class
        // probe is the ground truth, so a connector that words its
        // refusal differently degrades to the fallback instead of
        // failing every zero-contention publish forever. The probe
        // itself can only run when the parent still exists (otherwise
        // the fallback's own parent check fails loudly anyway).
        if (unsupported(e)) fallback()
        else if (!fs.exists(marker.getParent))
          // the refusal was the call working as intended (no parent to
          // attach to) — don't probe (and above all don't CACHE a
          // verdict learned while the store was in that state)
          fail(s"parent dir vanished: ${e.getMessage}")
        else {
          // only DEFINITIVE probe verdicts are cached; an inconclusive
          // probe (transient IOException) serves THIS call via the
          // fallback and leaves the cache empty so a later attempt
          // re-probes a healthy store back to the atomic path
          val verdict = Option(nonRecursiveSupport.get(fs.getClass))
            .orElse {
              val v = probeNonRecursive(fs, marker)
              v.foreach(b => nonRecursiveSupport.put(fs.getClass,
                Boolean.box(b)))
              v.map(Boolean.box)
            }
          verdict match {
            case Some(java.lang.Boolean.TRUE) =>
              fail(s"taken, or the dir vanished: ${e.getMessage}")
            case _ => fallback()
          }
        }
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
