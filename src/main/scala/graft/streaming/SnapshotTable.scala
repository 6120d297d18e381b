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

  /** Parse a `v=N` dir name, skipping foreign names (an ops copy
    * `v=3.bak`, a partial `v=`): one stray non-numeric dir must never
    * wedge every read and commit on the root with a
    * NumberFormatException. */
  private def versionOfName(name: String): Option[Long] =
    scala.util.Try(name.stripPrefix("v=").toLong).toOption

  private def versionsOf(s: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(s, root)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap(st => versionOfName(st.getPath.getName))
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/v=$v/_COMMITTED")))
      .sorted
  }

  /** Highest committed version, if any. */
  def latestVersion(s: SparkSession, root: String): Option[Long] =
    versionsOf(s, root).lastOption

  /** All committed versions, ascending. Public so fixed-length builders
    * (table_time_travel's 3-commit table) can gate on HOW MANY commits
    * landed, not just whether any did — a prior process that died after
    * 1-2 of N commits must be resumed, not skipped. */
  def committedVersions(s: SparkSession, root: String): Seq[Long] =
    versionsOf(s, root)

  /** Resolve-once snapshot read: the returned frame is pinned to the
    * version current at call time and is immune to later commits. */
  def read(s: SparkSession, root: String): Option[DataFrame] =
    latestVersion(s, root).map(v => s.read.parquet(s"$root/v=$v"))

  /** Read a specific committed version (time travel). */
  def readVersion(s: SparkSession, root: String, v: Long): DataFrame = {
    require(versionsOf(s, root).contains(v), s"version $v not committed")
    s.read.parquet(s"$root/v=$v")
  }

  /** A marker-less `v=N` dir older than this is an orphan from a
    * commit that died between its rename and its marker create — no
    * in-flight commit can still be publishing it (rename is atomic;
    * only the sub-second marker create follows), so it is garbage. The
    * gate only throttles DELETION; version numbering skips past
    * orphans of any age, so a fresh one never wedges the table. */
  private val orphanGateMs = 15L * 60 * 1000

  /** All `v=N` numbers present on disk, committed or not. */
  private def allVersionDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
  }

  /** Commit `transform(current)` as the next version; returns it.
    * The new image is STAGED under a unique name (never at a `v=` path
    * another commit could target), then published by rename only after
    * re-checking the base is still current — so a lost race fails
    * loudly at the re-check, the landing check after the rename (a
    * Hadoop rename onto an EXISTING dir "succeeds" by moving the stage
    * INSIDE it — the loser detects the nesting, removes its stage, and
    * throws the documented conflict), or the exclusive marker create,
    * and can never clobber the winner's files. A failed commit leaves
    * at most an invisible staging dir — or a marker-less `v=N` dir if
    * it died between rename and marker, which later commits SKIP past
    * when numbering (so the table stays commitable) and DELETE once
    * it is older than the orphan gate. */
  def commit(s: SparkSession, root: String, retain: Int = 2,
      afterStage: String => Unit = _ => ())(
      transform: Option[DataFrame] => DataFrame): Long = {
    require(retain >= 1, "retain must keep at least the new version")
    val fs = fsOf(s, root)
    val base = latestVersion(s, root)
    val stage = s"$root/.stage-${java.util.UUID.randomUUID()}"
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    // a failed build must not leak a full-size stage copy of the
    // table (the orphan sweep only matches v=* names; nothing else
    // would ever reclaim a .stage dir on a shared root) — same
    // discipline as Artifacts.materialize's tmp cleanup
    try {
      transform(base.map(v => s.read.parquet(s"$root/v=$v")))
        .write.mode("overwrite").parquet(stage)
      // stage-enrichment hook (commitWithStats writes the `_stats`
      // manifest here) — runs while the stage is still invisible, so
      // whatever it adds is atomic with the version
      afterStage(stage)
    } catch { case e: Throwable => fs.delete(stagePath, true); throw e }
    def conflict(cleanup: org.apache.hadoop.fs.Path): Nothing = {
      fs.delete(cleanup, true)
      throw new IllegalStateException(
        s"snapshot commit conflict at $root: base $base superseded")
    }
    // one fresh listing serves both the race re-check and the orphan
    // sweep's committed set (each versionsOf is a listing + one RPC
    // per version — metadata latency worth halving on object stores;
    // a production deployment replaces this whole resolution path
    // with a metastore CAS anyway)
    val nowCommitted = versionsOf(s, root)
    if (nowCommitted.lastOption != base) conflict(stagePath)
    // orphan handling: delete marker-less dirs past the age gate
    // (skip the deletion when the store reports no usable dir mtime —
    // epoch-0 on synthetic object-store dirs would read as infinitely
    // old and delete a LIVE publish), clean aged .stage-* leftovers
    // from crashed commits, and number the new version past every v=
    // dir still on disk — an orphaned v=N must never be the rename
    // target (the rename would nest into it and every retry would
    // conflict forever)
    val committed = nowCommitted.toSet
    val now = System.currentTimeMillis()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".stage-") &&
        st.getPath.getName != stagePath.getName &&
        st.getModificationTime > 0 &&
        now - st.getModificationTime > orphanGateMs)
      .foreach(st => fs.delete(st.getPath, true))
    val live = allVersionDirs(fs, root).flatMap { st =>
      versionOfName(st.getPath.getName).map(v => (st, v))
    }.filter { case (st, v) =>
      if (committed.contains(v)) true
      else if (st.getModificationTime > 0 &&
          now - st.getModificationTime > orphanGateMs) {
        fs.delete(st.getPath, true); false
      } else true
    }.map(_._2)
    val next = (live :+ base.getOrElse(-1L)).max + 1
    publish(fs, root, stagePath, next)
    // vacuum past the retention horizon (never the newest `retain`)
    versionsOf(s, root).dropRight(retain).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v=$v"), true))
    next
  }

  /** Publish a staged snapshot at `v=next`: rename, verify the stage
    * LANDED at exactly `v=next` (a Hadoop rename onto a dir another
    * writer created in the race window "succeeds" by nesting the stage
    * INSIDE it — that loser must clean its nested dir up and conflict,
    * never leave it hidden inside the winner's snapshot), then create
    * the exclusive marker. Package-visible so the race window — too
    * narrow to hit through commit() in a test — is testable directly. */
  private[graft] def publish(fs: org.apache.hadoop.fs.FileSystem,
      root: String, stagePath: org.apache.hadoop.fs.Path,
      next: Long): Unit = {
    def conflict(cleanup: org.apache.hadoop.fs.Path): Nothing = {
      fs.delete(cleanup, true)
      throw new IllegalStateException(
        s"snapshot commit conflict at $root: v=$next taken")
    }
    val dest = new org.apache.hadoop.fs.Path(s"$root/v=$next")
    if (!fs.rename(stagePath, dest)) conflict(stagePath)
    val nested = new org.apache.hadoop.fs.Path(dest, stagePath.getName)
    if (fs.exists(nested)) conflict(nested)
    // a rename keeps the STAGE's mtime, which can already be past the
    // orphan gate when the build + afterStage (a distributed stats
    // pass) ran long — refresh it so a concurrent commit's orphan
    // sweep can never read the just-renamed dir as an aged corpse in
    // the window before the marker lands (best-effort: some stores
    // reject setTimes on dirs)
    try fs.setTimes(dest, System.currentTimeMillis(), -1)
    catch { case _: java.io.IOException => () }
    // createNonRecursive: a plain create() would re-create missing
    // parents, so if a racer deleted dest in this window the marker
    // would RESURRECT v=next as an empty committed version that then
    // serves as latest; non-recursive create fails instead and the
    // commit conflicts loudly
    try fs.createNonRecursive(new org.apache.hadoop.fs.Path(
        s"$root/v=$next/_COMMITTED"), false, 4096,
        fs.getDefaultReplication(dest), fs.getDefaultBlockSize(dest),
        null).close()
    catch { case _: java.io.IOException =>
      // marker taken ⇒ v=next was committed by someone else and the
      // landing check somehow passed (e.g. object stores where rename
      // is copy-like) — or the dir vanished under us; either way our
      // image is unreferenced — leave whatever exists untouched and
      // fail as a conflict
      throw new IllegalStateException(
        s"snapshot commit conflict at $root: marker for v=$next " +
          "not creatable (taken, or the dir vanished)")
    }
  }

  /** A pruned snapshot read: the frame, how many part files the stats
    * manifest let the scan SKIP, and how many the version holds. */
  case class PrunedScan(df: DataFrame, filesRead: Int, filesTotal: Int)

  /** Name of the per-version file-stats manifest dir. Underscore-
    * prefixed so every parquet reader's hidden-path filter ignores it
    * when scanning the version dir itself. */
  private val statsDir = "_stats"

  /** Commit with a FILE-LEVEL MIN/MAX STATS MANIFEST on `statsCol`
    * (the data-skipping metadata every table format keeps — Iceberg
    * manifests / Delta file stats): after the snapshot is staged, one
    * distributed pass groups it by `input_file_name()` and records
    * each part file's (min, max, rows) for the column as parquet under
    * `v=N/_stats` — typed exactly as the column is, so pruning
    * predicates compare natively, never through strings. The manifest
    * is written INSIDE the stage before the rename, so it is atomic
    * with the version: committed with it, time-traveled with it,
    * vacuumed with it.
    *
    * Skipping only pays if files have tight disjoint ranges, so pair
    * this with [[clusterBy]] in the transform. At 100 TB this is the
    * difference between listing 800k file footers and reading a
    * driver-side manifest: a selective predicate touches only the
    * files whose range overlaps, without opening the rest at all. */
  def commitWithStats(s: SparkSession, root: String, statsCol: String,
      retain: Int = 2)(
      transform: Option[DataFrame] => DataFrame): Long =
    commit(s, root, retain, afterStage = { stage =>
      import org.apache.spark.sql.functions._
      s.read.parquet(stage)
        // basename only: the stage dir is renamed to v=N at publish
        .groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
        .agg(min(col(statsCol)).as("min"), max(col(statsCol)).as("max"),
          count(lit(1)).as("rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/$statsDir")
    })(transform)

  /** Multi-column manifests live one parquet dataset per column under
    * `v=N/_stats_cols/<col>` (each typed as its own column, which one
    * mixed-type dataset could not be); the flat single-column layout
    * above stays as-is so existing tables keep pruning. */
  private val statsColsDir = "_stats_cols"

  /** [[commitWithStats]] for SEVERAL columns — the manifest shape
    * multi-dimensional skipping needs (each predicate dimension prunes
    * independently; [[readPrunedBox]] intersects the survivors). One
    * distributed pass per column over the staged snapshot; pair with
    * [[clusterByZ]] so BOTH dimensions have file-local ranges. */
  def commitWithStatsCols(s: SparkSession, root: String,
      statsCols: Seq[String], retain: Int = 2)(
      transform: Option[DataFrame] => DataFrame): Long =
    commit(s, root, retain, afterStage = { stage =>
      import org.apache.spark.sql.functions._
      // ONE distributed pass computes every column's per-file stats
      // (re-scanning the fresh snapshot once per column would be N
      // full passes at 100 TB); the per-column manifests — each typed
      // as its own column — are then tiny driver-side projections of
      // the files_total-row result
      val aggs = statsCols.flatMap(c => Seq(
        min(col(c)).as(s"min__$c"), max(col(c)).as(s"max__$c"))) :+
        count(lit(1)).as("rows")
      val stats = s.read.parquet(stage)
        .groupBy(element_at(split(input_file_name(), "/"), -1)
          .as("file"))
        .agg(aggs.head, aggs.tail: _*)
        .coalesce(1)
        .persist()
      try {
        statsCols.foreach { c =>
          stats.select(col("file"), col(s"min__$c").as("min"),
              col(s"max__$c").as("max"), col("rows"))
            .write.mode("overwrite").parquet(s"$stage/$statsColsDir/$c")
        }
      } finally { stats.unpersist(blocking = false); () }
    })(transform)

  /** The per-file stats manifest for column `c` on the latest version,
    * if that version carries one — the manifest doubles as lightweight
    * TABLE STATS (global min/max = min-of-mins/max-of-maxes over its
    * files_total rows, driver-cheap) so callers never re-scan the data
    * files for a bound the metadata already knows. */
  def colStats(s: SparkSession, root: String,
      c: String): Option[DataFrame] =
    latestVersion(s, root).flatMap { v =>
      val p = new org.apache.hadoop.fs.Path(
        s"$root/v=$v/$statsColsDir/$c")
      if (fsOf(s, root).exists(p)) Some(s.read.parquet(p.toString))
      else None
    }

  /** Read the latest version pruned by a conjunctive BOX predicate:
    * for each (column, lo, hi) a file survives only if its manifest
    * range overlaps [lo, hi] — the per-column keep sets intersect, so
    * one excluding dimension is enough to skip a file (exactly how
    * Delta/Iceberg evaluate data-skipping conjuncts). Columns with no
    * manifest under this version prune nothing (conservative); a
    * version with NO manifests at all falls back to the full scan. */
  def readPrunedBox(s: SparkSession, root: String,
      preds: Seq[(String, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)]): PrunedScan = {
    val v = latestVersion(s, root).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val dir = s"$root/v=$v"
    val total = fileCount(s, root, v)
    val fs = fsOf(s, root)
    import org.apache.spark.sql.functions._
    val keepSets = preds.flatMap { case (c, lo, hi) =>
      val m = new org.apache.hadoop.fs.Path(s"$dir/$statsColsDir/$c")
      if (!fs.exists(m)) None
      else Some(s.read.parquet(m.toString)
        .where(col("max") >= lo && col("min") <= hi)
        .select("file").collect().map(_.getString(0)).toSet)
    }
    if (keepSets.isEmpty) PrunedScan(s.read.parquet(dir), total, total)
    else {
      val keep = keepSets.reduce(_ intersect _)
        .toSeq.sorted.map(f => s"$dir/$f")
      val df =
        if (keep.isEmpty) s.read.parquet(dir).where(lit(false))
        else s.read.parquet(keep: _*)
      PrunedScan(df, keep.length, total)
    }
  }

  /** Z-ORDER-cluster an image on two columns (Delta's OPTIMIZE ZORDER
    * BY for the 2-D case): each column is normalized to a 16-bit grid
    * coordinate against its own min/max (one 4-scalar driver agg — at
    * production scale these come from table stats), the coordinates
    * are bit-interleaved into a Morton code, and the image is
    * range-shuffled on that code into `partitions` files. Because the
    * Z-curve preserves 2-D locality, every file's [min, max] range is
    * tight on BOTH columns, so a [[readPrunedBox]] box predicate skips
    * on either dimension — the property 1-D [[clusterBy]] gives only
    * its sort column. The Morton spread is plain long arithmetic
    * (shifts + masks), fully codegen-friendly. */
  def clusterByZ(df: DataFrame, c1: String, c2: String,
      partitions: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DateType, TimestampNTZType,
      TimestampType}
    // temporal columns go through epoch micros (TIMESTAMP_NTZ has no
    // direct double cast); everything numeric casts straight
    def asNum(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case TimestampType | TimestampNTZType | DateType =>
          unix_micros(col(c).cast("timestamp")).cast("double")
        case _ => col(c).cast("double")
      }
    val r = df.agg(min(asNum(c1)), max(asNum(c1)),
      min(asNum(c2)), max(asNum(c2))).first()
    // empty input or an all-null/uncastable cluster column has no
    // ranges to normalize against — clustering is meaningless there,
    // so degrade to a plain fixed-width shuffle instead of an NPE on
    // the null agg row (the 1-D clusterBy handles the same input fine)
    if ((0 to 3).exists(r.isNullAt)) return df.repartition(partitions)
    def grid(c: String, lo: Double, hi: Double):
        org.apache.spark.sql.Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(floor((asNum(c) - lit(lo)) / lit(span)
        * 65535.0), lit(0.0)), lit(65535.0)).cast("long")
    }
    // spread 16 bits to the even positions of 32 (standard Morton
    // magic-mask spreading), interleave x into the odd bits
    def spread(v0: org.apache.spark.sql.Column):
        org.apache.spark.sql.Column = {
      var v = v0
      v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
      v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
      v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
      v
    }
    val z = spread(grid(c1, r.getDouble(0), r.getDouble(1))) * 2 +
      spread(grid(c2, r.getDouble(2), r.getDouble(3)))
    df.withColumn("_graft_z", z)
      .repartitionByRange(partitions, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
  }

  /** RANGE-CLUSTER an image on `c` so part files carry tight disjoint
    * ranges and the stats manifest can actually skip: a sampled range
    * shuffle into `partitions` files, sorted within each. This is the
    * 1-D form of the clustering write (Delta OPTIMIZE ZORDER / Iceberg
    * sort orders) — at scale, pick `partitions` from bytes/128 MB. */
  def clusterBy(df: DataFrame, c: String, partitions: Int): DataFrame =
    df.repartitionByRange(partitions,
      org.apache.spark.sql.functions.col(c)).sortWithinPartitions(c)

  /** Read the latest version PRUNED to part files whose [min, max]
    * range on the manifest column overlaps [lo, hi] — file-level data
    * skipping off the `_stats` manifest, no footer of a skipped file
    * is ever opened. Conservative by construction (a kept file may
    * still hold non-matching rows — callers apply the exact predicate
    * on top, and Spark then prunes row groups inside kept files via
    * parquet's own min/max); a version with NO manifest (e.g. one
    * produced by a plain commit or [[compact]]) falls back to the full
    * scan, still correct. Bounds are Columns so callers pass natively
    * typed literals (`lit("1994-01-01").cast("timestamp")`). */
  def readPruned(s: SparkSession, root: String,
      lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): PrunedScan = {
    val v = latestVersion(s, root).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val dir = s"$root/v=$v"
    val total = fileCount(s, root, v)
    val fs = fsOf(s, root)
    val manifest = new org.apache.hadoop.fs.Path(s"$dir/$statsDir")
    if (!fs.exists(manifest))
      PrunedScan(s.read.parquet(dir), total, total)
    else {
      import org.apache.spark.sql.functions._
      val keep = s.read.parquet(manifest.toString)
        .where(col("max") >= lo && col("min") <= hi)
        .select("file").collect().map(r => s"$dir/${r.getString(0)}")
      val df =
        if (keep.isEmpty) s.read.parquet(dir).where(lit(false))
        else s.read.parquet(keep.toIndexedSeq: _*)
      PrunedScan(df, keep.length, total)
    }
  }

  /** Small-file COMPACTION (the maintenance op every table format
    * ships — Iceberg's rewrite_data_files / Delta's OPTIMIZE): commit
    * a new version whose rows are IDENTICAL but rewritten into
    * `targetFiles` parquet files via coalesce (narrow — no shuffle;
    * production picks the target from a size estimate, bin-packing
    * ~128 MB files). Riding the normal commit path means compaction
    * inherits every isolation property for free: readers pinned to the
    * fragmented version keep it until the vacuum horizon passes, a
    * racing data commit wins or loses exactly like any commit, and
    * time travel still serves the pre-compaction image. Returns the
    * new version. */
  def compact(s: SparkSession, root: String, targetFiles: Int = 1): Long =
    commit(s, root) { cur =>
      require(cur.isDefined, s"compact: no committed version at $root")
      cur.get.coalesce(targetFiles)
    }

  /** Parquet part-file count of a committed version (compaction's
    * observable effect; marker and _SUCCESS excluded). */
  def fileCount(s: SparkSession, root: String, v: Long): Int = {
    val fs = fsOf(s, root)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/v=$v"))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }
}
