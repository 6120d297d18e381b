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
}

class GraftStreamSource(ctx: SQLContext, root: String, key: String,
    startingVersion: Option[Long]) extends Source {
  private def s = ctx.sparkSession

  // the bootstrap version is pinned at source creation (restarts
  // re-create the source but resume from the checkpointed offset, so
  // this only matters for a FRESH query)
  private lazy val startV: Long = startingVersion.getOrElse(
    SnapshotTable.committedVersions(s, root).headOption.getOrElse(
      throw new IllegalStateException(
        s"no committed version at $root")))

  override def schema: StructType = GraftStreaming.changeSchema(
    SnapshotTable.schemaOfVersion(s, root,
      SnapshotTable.resolveSnapshot(s, root, None, None)))

  override def getOffset: Option[Offset] =
    SnapshotTable.latestVersion(s, root).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
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
        if (sv == endV)
          SnapshotTable.readVersion(s, root, endV).limit(0)
            .withColumn("_change_type", lit("insert"))
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
