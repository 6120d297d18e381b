package graft.dsv2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.mapreduce.{JobID, RecordWriter, TaskAttemptContext,
  TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions,
  NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DeltaBatchWrite,
  DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation,
  RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDelta,
  WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.{DataType, StringType, StructField,
  StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.SnapshotTable

/** SQL ROW-LEVEL COMMANDS for graft tables (round-19 verdict item 1 —
  * "the genre's CDC upsert is the verb every warehouse SQL user
  * reaches for first"): `MERGE INTO`, arbitrary-predicate `DELETE`,
  * and `UPDATE` through Spark's [[SupportsDelta]] machinery.
  *
  *   MERGE INTO graft.t AS t USING src AS s ON t.k = s.k
  *     WHEN MATCHED AND s.op = 'del' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *
  * The DELTA-BASED (merge-on-read) plan shape, not the group-based
  * (copy-on-write) one: Spark's analyzer ([[org.apache.spark.sql
  * .catalyst.analysis.RewriteMergeIntoTable]] et al.) joins source
  * against the pinned target scan, evaluates every WHEN clause —
  * conditions, multiple clauses, NOT MATCHED BY SOURCE, the
  * cardinality check — and hands this connector only ROW-LEVEL VERBS
  * (insert/delete; updates split via
  * `representUpdateAsDeleteAndInsert`). Executors STAGE those verbs
  * as parquet under the table root (one file per task, O(delta)
  * bytes — never the table), and the driver-side commit lowers the
  * staged batch onto [[SnapshotTable.commitMergeDV]]: deletes become
  * deletion-vector tombstones, inserts the fresh segment — the exact
  * O(batch) merge-on-read commit the library API performs, CAS-pinned
  * to the version the target scan read (a concurrent commit surfaces
  * as a loud [[graft.streaming.SnapshotConflictException]], never a
  * lost update).
  *
  * ROW IDENTITY: delta plans address rows by a connector-declared id
  * ([[SupportsDelta.rowId]]). A graft table declares its id column
  * explicitly — `TBLPROPERTIES ('graft.rowid'='k')` at CREATE TABLE
  * or [[SnapshotTable.setRowId]] — stored physical-name-stable so
  * renames keep it valid, and required to agree with the table's
  * deletion-vector key. Tables WITHOUT a declared id stay plain
  * [[GraftTable]]s (point DELETE via `SupportsDelete` still works);
  * MERGE/UPDATE on them fail with Spark's standard unsupported-table
  * error rather than guessing identity from column order. */
class GraftRowLevelTable(root: String, snapshotVersion: Long,
    val rowIdCol: String)
    extends GraftTable(root, snapshotVersion)
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** Declaring a row identity makes that column NON-NULL by contract
    * (a null id names no row: the DV equality probe can never address
    * it), and Spark's rewrite requires it
    * (NULLABLE_ROW_ID_ATTRIBUTES). Surfacing the constraint in the
    * schema also makes the write path enforce it: an INSERT of a
    * nullable expression into the id column fails analysis instead of
    * landing unaddressable rows. */
  override def schema(): StructType = {
    val base = super.schema()
    StructType(base.fields.map(f =>
      if (f.name == rowIdCol) f.copy(nullable = false) else f))
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new GraftRowLevelOperation(root, snapshotVersion, rowIdCol,
          info.command)
    }
}

class GraftRowLevelOperation(root: String, version: Long,
    rowIdCol: String, cmd: RowLevelOperation.Command)
    extends SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The target-side scan of the rewritten plan: the same pinned,
    * manifest-pruned, DV-applied scan every front-door read uses —
    * pushed join predicates prune target files before the merge join
    * touches them. */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftScanBuilder(root, version,
      SnapshotTable.schemaOfVersion(SparkSession.active, root, version))

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(rowIdCol))

  /** Updates arrive as DELETE(old id) + INSERT(new row): the merge
    * commit hides every batch id behind a deletion vector and writes
    * the insert rows as the fresh segment, so a key-preserving update
    * and a key-reassigning one take the identical O(batch) path. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(info: LogicalWriteInfo)
      : DeltaWriteBuilder = new DeltaWriteBuilder {
    override def build(): DeltaWrite = {
      // the stage layout is the TABLE's shape, not info.schema(): a
      // pure DELETE's write schema is EMPTY (only row ids arrive), a
      // merge's equals the table — staging at the table shape serves
      // every command, with the insert/id projections mapped in by
      // name
      val tableSchema = SnapshotTable.schemaOfVersion(
        SparkSession.active, root, version)
      val rowSchema = info.schema()
      val rowIdSchema = Option(info.rowIdSchema().orElse(null))
        .getOrElse(StructType(Seq(StructField(rowIdCol,
          tableSchema(rowIdCol).dataType))))
      new GraftDeltaWrite(root, version, rowIdCol, tableSchema,
        rowSchema, rowIdSchema)
    }
  }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, root=$root, v=$version, " +
      s"rowId=$rowIdCol)"
}

private[dsv2] object GraftDeltaWrite {
  /** One sentinel column in front of the (all-nullable) table row:
    * "I" rows carry a full inserted/updated row, "D" rows carry only
    * the row-id column (payload NULL — never read). */
  val opCol = "_graft_rl_op"

  def stageSchema(rowSchema: StructType): StructType =
    StructType(StructField(opCol, StringType, nullable = false) +:
      rowSchema.fields.map(_.copy(nullable = true)))
}

private[dsv2] case class GraftDeltaMessage(path: Option[String])
  extends WriterCommitMessage

class GraftDeltaWrite(root: String, baseVersion: Long, rowIdCol: String,
    tableSchema: StructType, rowSchema: StructType,
    rowIdSchema: StructType) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new GraftDeltaBatchWrite(root, baseVersion, rowIdCol, tableSchema,
      rowSchema, rowIdSchema)
  override def description(): String =
    s"GraftDeltaWrite(root=$root, base=v$baseVersion)"
}

class GraftDeltaBatchWrite(root: String, baseVersion: Long,
    rowIdCol: String, tableSchema: StructType, rowSchema: StructType,
    rowIdSchema: StructType) extends DeltaBatchWrite {

  // staged under the table root (cluster-visible, same permissions as
  // segments); a `.deltastage-` prefix distinct from `.stage-` so the
  // 15-minute commit-stage orphan sweep can never reclaim a long
  // merge's staging mid-write — commit/abort below clean it, and
  // finalizePublish sweeps aged corpses on a 24 h gate
  private val stageDir =
    s"$root/.deltastage-${java.util.UUID.randomUUID()}"

  private def spark = SparkSession.active
  private def fs = new HPath(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DeltaWriterFactory =
    new GraftDeltaWriterFactory(stageDir,
      GraftDeltaWrite.stageSchema(tableSchema), rowSchema, rowIdSchema,
      new SerialHadoopConf(spark.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    import org.apache.spark.sql.functions.col
    val s = spark
    val files = messages.toSeq.collect {
      case GraftDeltaMessage(Some(p)) => p }
    try {
      if (files.nonEmpty) {
        val staged = s.read
          .schema(GraftDeltaWrite.stageSchema(tableSchema))
          .parquet(files: _*)
        // the merge-on-read lowering: every staged row's id tombstones
        // its existing row (commitMergeDV's DV probe), the "I" rows
        // form the fresh segment. CAS against the version the target
        // scan was pinned to — serializable, loud on races.
        SnapshotTable.commitMergeDV(s, root, staged, rowIdCol,
          retain = GraftTable.retain(s, root),
          expectedBase = baseVersion)((_, b) =>
          b.where(col(GraftDeltaWrite.opCol) === "I")
            .drop(GraftDeltaWrite.opCol))
        ()
      }
    } finally { fs.delete(new HPath(stageDir), true); () }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    fs.delete(new HPath(stageDir), true); ()
  }
}

class GraftDeltaWriterFactory(stageDir: String, stageSchema: StructType,
    rowSchema: StructType, rowIdSchema: StructType,
    conf: SerialHadoopConf) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaRowWriter(stageDir, stageSchema, rowSchema,
      rowIdSchema, conf, partitionId, taskId)
}

/** Executor-side staging writer: verbs land as parquet rows through
  * Spark's own [[ParquetWriteSupport]] (the identical encoder the
  * normal write path uses — types, decimals, timestamps all match
  * what the driver-side read expects). One file per (partition, task
  * attempt); speculative losers' files are simply never named by a
  * committed message and vanish with the staging dir. */
class GraftDeltaRowWriter(stageDir: String, stageSchema: StructType,
    rowSchema: StructType, rowIdSchema: StructType,
    conf: SerialHadoopConf, partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val file = s"$stageDir/delta-p$partitionId-t$taskId.parquet"
  private var writer: RecordWriter[Void, InternalRow] = _
  private var ctx: TaskAttemptContext = _

  // stage positions by NAME, never by ordinal assumption: the row and
  // row-id schemas are projections Spark hands us; the stage layout is
  // op + table columns
  private val rowPos = rowSchema.fieldNames.map(stageSchema.fieldIndex)
  private val idPos = rowIdSchema.fieldNames.map(stageSchema.fieldIndex)
  private val rowTypes: Array[DataType] = rowSchema.fields.map(_.dataType)
  private val idTypes: Array[DataType] = rowIdSchema.fields.map(_.dataType)
  private val buf = new Array[Any](stageSchema.length)
  private val opI = UTF8String.fromString("I")
  private val opD = UTF8String.fromString("D")

  private def ensureWriter(): Unit = if (writer == null) {
    val c = new Configuration(conf.value)
    ParquetWriteSupport.setSchema(stageSchema, c)
    c.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    // the write-path knobs ParquetFileFormat.prepareWrite would set;
    // pinned so the staged bytes are self-consistent whatever the
    // session conf says (CORRECTED: no pre-Gregorian data here)
    c.set("spark.sql.parquet.writeLegacyFormat", "false")
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.parquet.fieldId.write.enabled", "false")
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.variant.annotateLogicalType.enabled",
      "false")
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graftdelta", 0), TaskType.MAP, partitionId),
      0)
    ctx = new TaskAttemptContextImpl(c, attempt)
    writer = new ParquetOutputFormat[InternalRow]() {
      override def getDefaultWorkFile(t: TaskAttemptContext,
          ext: String): HPath = new HPath(file)
    }.getRecordWriter(ctx)
  }

  private def emit(op: UTF8String, src: InternalRow, pos: Array[Int],
      types: Array[DataType]): Unit = {
    ensureWriter()
    java.util.Arrays.fill(buf.asInstanceOf[Array[AnyRef]], null)
    buf(0) = op
    var i = 0
    while (i < pos.length) {
      buf(pos(i)) = if (src.isNullAt(i)) null else src.get(i, types(i))
      i += 1
    }
    // consumed synchronously by the record writer (parquet buffers
    // copy reused binaries), so the reused buf/array is safe
    writer.write(null, new GenericInternalRow(buf))
  }

  override def insert(row: InternalRow): Unit = emit(opI, row, rowPos,
    rowTypes)

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    emit(opD, id, idPos, idTypes)

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    // unreachable with representUpdateAsDeleteAndInsert=true; kept
    // semantically exact should the flag ever flip
    delete(meta, id); insert(row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(ctx); writer = null }
    GraftDeltaMessage(if (ctx != null) Some(file) else None)
  }

  override def abort(): Unit = close()

  override def close(): Unit =
    if (writer != null) { writer.close(ctx); writer = null }
}

/** Minimal serializable Hadoop-conf carrier (the standard connector
  * idiom; Spark's own wrapper is spark-private). */
class SerialHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
