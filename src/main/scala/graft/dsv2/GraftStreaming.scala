package graft.dsv2

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.streaming.{SnapshotConflictException, SnapshotTable}

/** STREAMING FRONT DOOR for the lake table (round 18; the Delta
  * streaming-source/sink shape through the STANDARD Spark surface —
  * the library wrappers `Streams.tableChangeStream` /
  * `snapshotMergeStream` already exist; this makes them reachable as
  * `spark.readStream.format("graft")` / `writeStream.format("graft")`
  * like any other connector).
  *
  * Source (`.option("changeKey", k)[.option("startingVersion", v)]`):
  * a VERSION-TAILING changelog — offsets ARE committed table versions,
  * the first batch is the start version's full image as `insert` rows
  * (Delta's initial-snapshot semantics), every subsequent batch is
  * `readChanges` over exactly the newly committed span, with
  * `_change_type` in {insert, delete, update_preimage,
  * update_postimage}. Replay-deterministic by construction: versions
  * are immutable, so `getBatch` over a committed span always returns
  * the same rows (the contract Structured Streaming's WAL replay
  * needs). Retention must cover consumer lag, exactly like every CDF
  * consumer — a vacuumed-away offset fails loudly.
  *
  * Sink (`.option("mergeKey", k)[.option("mode", "mor"|"cow")]
  * [.option("appId", id)][.option("retain", n)]`): each micro-batch is
  * one keyed merge commit — merge-on-read ([[SnapshotTable
  * .commitMergeDV]], the steady-CDC default) or copy-on-write — with
  * the (appId, batchId) txn token as the replay guard: at-least-once
  * foreachBatch redelivery finds the batch already absorbed and SKIPS,
  * so the table state is exactly-once without a side checkpoint. The
  * batch's rows for a key REPLACE that key's rows. */
private[dsv2] object GraftStreaming {
  def changeSchema(table: StructType): StructType =
    StructType(table.fields :+
      StructField("_change_type", StringType, nullable = false))

  def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  /** Re-plan a DataFrame's physical rows as a fresh (streaming- or
    * batch-tagged) frame — the standard V1 streaming-connector shim:
    * a Source's getBatch result must report isStreaming=true, and a
    * Sink must detach the micro-batch from its incremental plan
    * before reusing it in ordinary actions. `internalCreateDataFrame`
    * is Spark-internal but JVM-public (Scala package-private), the
    * same seam every V1 source/sink era connector rides. */
  def replan(df: DataFrame, isStreaming: Boolean): DataFrame = {
    val session = df.sparkSession
    val rdd = df.queryExecution.toRdd.map(_.copy())
    val m = session.getClass.getMethods.find(x =>
      x.getName == "internalCreateDataFrame" &&
        x.getParameterCount == 3).getOrElse(
      throw new IllegalStateException(
        "internalCreateDataFrame not found on SparkSession"))
    m.invoke(session, rdd, df.schema,
      java.lang.Boolean.valueOf(isStreaming)).asInstanceOf[DataFrame]
  }

  // ---- throttle position sidecar (under the source's checkpoint-
  // scoped metadataPath; write-then-rename so a torn write reads as
  // absent — the fallback is one unthrottled batch, never a
  // regressed offset) ------------------------------------------------

  private val positionFile = "graft-throttle-position"

  def readPosition(conf: org.apache.hadoop.conf.Configuration,
      metadataPath: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, positionFile)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val raw = new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        raw.toLongOption
      } finally in.close()
    }
  }

  def writePosition(conf: org.apache.hadoop.conf.Configuration,
      metadataPath: String, v: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(metadataPath)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) { fs.mkdirs(dir); () }
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".$positionFile.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new org.apache.hadoop.fs.Path(dir, positionFile)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) { fs.delete(tmp, false); () }
  }
}

class GraftStreamSource(ctx: SQLContext, root: String, key: String,
    startingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: Option[String] = None) extends Source {
  private def s = ctx.sparkSession

  // the bootstrap version is pinned at source creation (restarts
  // re-create the source but resume from the checkpointed offset, so
  // this only matters for a FRESH query)
  private lazy val startV: Long = startingVersion.getOrElse(
    SnapshotTable.committedVersions(s, root).headOption.getOrElse(
      throw new IllegalStateException(
        s"no committed version at $root")))

  // BACKLOG THROTTLE bookkeeping (round-19 verdict item 4): the
  // furthest span end this source has handed the engine, persisted
  // under the source's OWN checkpoint-scoped metadataPath so a
  // RESTARTED source seeds from it. The invariant that makes the
  // throttle safe: getOffset must NEVER offer an offset below the
  // engine's committed position (a regressed offset would commit,
  // move the engine's start backwards, and re-deliver an already-
  // delivered span — duplicate retract rows corrupt the fold). Every
  // committed batch had getBatch called first, which persists the
  // position before returning — so the seeded value is always >= the
  // committed offset, and a missing/unreadable seed falls back to
  // one UNTHROTTLED batch (today's behavior), never to regression.
  private def hadoopConf =
    ctx.sparkSession.sparkContext.hadoopConfiguration

  @volatile private var lastPlanned: Option[Long] =
    for {
      mp <- metadataPath if maxVersionsPerTrigger.isDefined
      v <- GraftStreaming.readPosition(hadoopConf, mp)
    } yield v

  private def recordPlanned(endV: Long): Unit = {
    val next = math.max(endV, lastPlanned.getOrElse(Long.MinValue))
    if (!lastPlanned.contains(next)) {
      lastPlanned = Some(next)
      for (mp <- metadataPath if maxVersionsPerTrigger.isDefined)
        GraftStreaming.writePosition(hadoopConf, mp, next)
    }
  }

  override def schema: StructType = GraftStreaming.changeSchema(
    SnapshotTable.schemaOfVersion(s, root,
      SnapshotTable.resolveSnapshot(s, root, None, None)))

  /** Without a cap, the offered offset is the table head — a consumer
    * restarting after long downtime then drains its ENTIRE version
    * backlog as ONE micro-batch (readChanges over the whole span),
    * arbitrarily large at 100 TB. `.option("maxVersionsPerTrigger",
    * n)` caps each offered span at n versions past the last planned
    * position (Delta's maxFilesPerTrigger analog); the changelog fold
    * is batching-insensitive by contract, so the final image is
    * identical however the spans split. */
  override def getOffset: Option[Offset] =
    SnapshotTable.latestVersion(s, root).map { latest =>
      val capped = (maxVersionsPerTrigger, lastPlanned) match {
        case (Some(n), Some(from)) => math.min(latest, from + n)
        case (Some(n), None) =>
          // fresh query (no persisted position): the first batch is
          // the bootstrap image at startV plus the span to the
          // offered end — cap the span past startV
          math.min(latest, startV + n)
        case _ => latest
      }
      LongOffset(capped)
    }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    recordPlanned(math.max(GraftStreaming.versionOf(end),
      start.map(GraftStreaming.versionOf).getOrElse(Long.MinValue)))
    import org.apache.spark.sql.functions.{col, lit}
    val endV = GraftStreaming.versionOf(end)
    val df = start match {
      case None =>
        // initial snapshot: the start version's image as inserts, plus
        // the changes committed between it and the first observed end
        val base = SnapshotTable.readVersion(s, root, startV)
          .withColumn("_change_type", lit("insert"))
        if (endV == startV) base
        else base.unionByName(
          SnapshotTable.readChanges(s, root, startV, endV, key))
      case Some(so) =>
        val sv = GraftStreaming.versionOf(so)
        // >= (not ==): defensive — an offset regression must serve an
        // EMPTY batch, never an inverted (duplicate-delivering) span
        if (sv >= endV)
          s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else SnapshotTable.readChanges(s, root, sv, endV, key)
    }
    GraftStreaming.replan(
      df.select(schema.fieldNames.toIndexedSeq.map(col): _*),
      isStreaming = true)
  }

  override def stop(): Unit = ()
}

class GraftStreamSink(root: String, mergeKey: String, appId: String,
    retain: Int, mor: Boolean) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val s = data.sparkSession
    // detach the micro-batch from its incremental streaming plan so
    // the merge commit can run it as a normal batch job
    val batch = GraftStreaming.replan(data, isStreaming = false)
    // check-and-act replay guard (the snapshotMergeBatch shape): the
    // base read is pinned as the CAS expectedBase, so a zombie driver
    // replaying this batch id between our token check and our commit
    // conflicts loudly instead of double-applying
    @annotation.tailrec
    def attempt(left: Int): Unit = {
      val base = SnapshotTable.latestVersion(s, root)
        .getOrElse(SnapshotTable.EmptyBase)
      val last = SnapshotTable.lastCommittedBatch(s, root, appId)
      if (!last.exists(_ >= batchId)) {
        val committed =
          try {
            if (mor)
              SnapshotTable.commitMergeDV(s, root, batch, mergeKey,
                retain, expectedBase = base,
                txn = Some((appId, batchId)))((_, b) => b)
            else
              SnapshotTable.commitMerge(s, root, batch, mergeKey,
                retain, expectedBase = base,
                txn = Some((appId, batchId)))((_, b) => b)
            true
          } catch {
            case _: SnapshotConflictException if left > 1 => false
          }
        if (!committed) attempt(left - 1)
      }
    }
    attempt(5)
  }

  override def name(): String = s"graft-sink.`$root`"
  override def schema(): StructType = StructType(Nil)
  override def toString: String =
    s"GraftStreamSink(root=$root, key=$mergeKey, " +
      s"mode=${if (mor) "mor" else "cow"})"
}
