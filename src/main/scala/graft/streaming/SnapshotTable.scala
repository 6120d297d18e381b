package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table with SNAPSHOT-ISOLATION reads — the
  * offline-available core of the ACID table formats the genre sinks to
  * (Hudi/Iceberg-style: immutable snapshot files + an atomic commit
  * marker), closing the gap `atomicStateSwap` leaves: that swap rotates
  * ONE canonical path in place, so a reader listing the path mid-swap
  * can race the renames; here every version is immutable once
  * committed and a reader resolves its version exactly once, so a
  * concurrent commit can NEVER perturb an in-flight read.
  *
  * Layout under `root/`:
  *   v=N/              immutable parquet snapshot (Spark-written)
  *   v=N/_COMMITTED    atomic commit marker (exclusive create)
  *
  * A version is visible iff its marker exists; the current table is
  * the highest committed N. Commit protocol: resolve base N, compute
  * the new image, write `v=N+1` (invisible while being written), then
  * atomically create the marker — with an optimistic re-check that the
  * base is still current right before marking, so a lost race fails
  * the commit instead of silently clobbering (single-writer is the
  * deployment norm; the check turns a misconfigured second writer into
  * a loud conflict). Older versions are pruned past `retain`
  * (retain>=2 keeps the immediately-previous snapshot alive for
  * readers that resolved just before a commit — the vacuum-horizon
  * trade every table format exposes).
  *
  * At 100 TB the only change is a real metastore CAS for the marker;
  * the data plane (immutable snapshot dirs, last-committed resolution,
  * retention horizon) is exactly this. */
object SnapshotTable {

  private def fsOf(s: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def versionsOf(s: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(s, root)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/v=$v/_COMMITTED")))
      .sorted
  }

  /** Highest committed version, if any. */
  def latestVersion(s: SparkSession, root: String): Option[Long] =
    versionsOf(s, root).lastOption

  /** Resolve-once snapshot read: the returned frame is pinned to the
    * version current at call time and is immune to later commits. */
  def read(s: SparkSession, root: String): Option[DataFrame] =
    latestVersion(s, root).map(v => s.read.parquet(s"$root/v=$v"))

  /** Read a specific committed version (time travel). */
  def readVersion(s: SparkSession, root: String, v: Long): DataFrame = {
    require(versionsOf(s, root).contains(v), s"version $v not committed")
    s.read.parquet(s"$root/v=$v")
  }

  /** Commit `transform(current)` as the next version; returns it.
    * The new image is STAGED under a unique name (never at a `v=` path
    * another commit could target), then published by rename only after
    * re-checking the base is still current — so a lost race fails
    * loudly at the re-check, the rename (destination taken), or the
    * exclusive marker create, and can never clobber the winner's
    * files. A failed commit leaves at most an invisible staging dir. */
  def commit(s: SparkSession, root: String, retain: Int = 2)(
      transform: Option[DataFrame] => DataFrame): Long = {
    require(retain >= 1, "retain must keep at least the new version")
    val fs = fsOf(s, root)
    val base = latestVersion(s, root)
    val stage = s"$root/.stage-${java.util.UUID.randomUUID()}"
    transform(base.map(v => s.read.parquet(s"$root/v=$v")))
      .write.mode("overwrite").parquet(stage)
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    def conflict(): Nothing = {
      fs.delete(stagePath, true)
      throw new IllegalStateException(
        s"snapshot commit conflict at $root: base $base superseded")
    }
    if (latestVersion(s, root) != base) conflict()
    val next = base.getOrElse(-1L) + 1
    if (!fs.rename(stagePath,
        new org.apache.hadoop.fs.Path(s"$root/v=$next"))) conflict()
    fs.create(new org.apache.hadoop.fs.Path(
      s"$root/v=$next/_COMMITTED"), false).close()
    // vacuum past the retention horizon (never the newest `retain`)
    versionsOf(s, root).dropRight(retain).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v=$v"), true))
    next
  }
}
