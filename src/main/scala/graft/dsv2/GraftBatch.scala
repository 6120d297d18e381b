package graft.dsv2

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BoundReference,
  UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition,
  FileStatusCache, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.streaming.SnapshotTable

/** NATIVE DSv2 batch read for the snapshot scan (round-19 verdict
  * item 2 — the round-18 door executed through `V1Scan` →
  * `BaseRelation.buildScan(): RDD[Row]`, paying an InternalRow → Row
  * → InternalRow conversion for EVERY row served; a pure
  * constant-factor CPU tax that scan-heavy front-door queries feel at
  * 100 TB).
  *
  * The replacement goes straight through Spark's own DSv2 parquet
  * machinery: the kept (manifest-pruned) files feed a real
  * [[ParquetScan]] — vectorized reader, row-group statistics pruning
  * from the pushed predicates (now physically pushed, not only
  * manifest-pruned), everything the native parquet path has — and the
  * rows surface as InternalRow/ColumnarBatch with ZERO conversion.
  * Column projection rides `readDataSchema` under PHYSICAL names in
  * the REQUIRED logical order, so logical↔physical renaming costs
  * nothing at runtime (names are metadata; ordinals line up by
  * construction).
  *
  * DELETION VECTORS split the file set:
  *  - UNMASKED files (the steady-state bulk — compaction and
  *    auto-maintenance fold vectors away) ride the inner parquet
  *    batch verbatim, split/packed by Spark's own planner, COLUMNAR
  *    when the session's vectorized reader is on.
  *  - MASKED files (the few a recent merge touched) read one file per
  *    partition with the DV key appended to the projection; a
  *    filtering reader drops tombstoned rows against the broadcast
  *    entry set and projects the key back off. Row-based — and
  *    because Spark requires a scan to be uniformly columnar or not,
  *    ANY masked file makes the whole scan row-based until the
  *    vectors fold (the same read-amplification trade the library
  *    path makes; bounded by the auto-maintain DV-density policy). */
class GraftBatch(root: String, version: Long, required: StructType,
    keptFn: () => Seq[String], pushed: Array[Filter]) extends Batch {

  private def spark = SparkSession.active

  // ---- driver-side plan state ---------------------------------------
  // Keyed to the CURRENT kept set: runtime filtering (GraftScan.filter)
  // can narrow it between toBatch and planInputPartitions, so the state
  // and the inner scans rebuild when (and only when) the set changed.

  @volatile private var cache
      : (Seq[String], GraftBatch.PlanState, Option[ParquetScan],
        Option[ParquetScan]) = null

  private def current: (Seq[String], GraftBatch.PlanState,
      Option[ParquetScan], Option[ParquetScan]) = synchronized {
    val kept = keptFn()
    val c = cache
    if (c != null && c._1 == kept) c
    else {
      val st = buildState(kept)
      val plain =
        if (st.unmasked.isEmpty) None
        else Some(parquetScanOver(st, st.unmasked, st.physReq))
      val masked =
        if (st.masked.isEmpty) None
        else Some(parquetScanOver(st, st.masked, st.maskedSchema))
      val built = (kept, st, plain, masked)
      cache = built
      built
    }
  }

  private def state: GraftBatch.PlanState = current._2
  private def plainScan: Option[ParquetScan] = current._3
  private def maskedScan: Option[ParquetScan] = current._4

  private def buildState(kept: Seq[String]): GraftBatch.PlanState = {
    val s = spark
    val fs = SnapshotTable.fsOf(s, root)
    val cm = SnapshotTable.colmapOf(fs, root, version)
    val fullPhys = SnapshotTable.physSchema(
      SnapshotTable.schemaOfVersion(s, root, version), cm)
    val physReq = SnapshotTable.physSchema(required, cm)
    val dv = SnapshotTable.dvOf(s, root, version)
    val dvByFile: Map[String, Set[Any]] = dv match {
      case None => Map.empty
      case Some((key, entries)) =>
        // the tombstone set is DRIVER-materialized for the broadcast
        // filter — bounded in practice by compaction/auto-maintain
        // (dvRowRatio folds vectors at 10% density), but a neglected
        // table must fail LOUDLY here, never OOM the driver silently
        val maxEntries = s.conf
          .get("spark.graft.dsv2.maxDvBroadcastEntries", "4000000")
          .toLong
        val n = entries.count()
        if (n > maxEntries) throw new IllegalStateException(
          s"table at $root v=$version carries $n deletion-vector " +
            s"entries — above spark.graft.dsv2.maxDvBroadcastEntries " +
            s"($maxEntries), too many to serve through the front " +
            "door's broadcast tombstone filter. Fold them first " +
            "(SnapshotTable.foldDeletionVectors / compact, or enable " +
            "spark.graft.autoMaintain.enabled), or read through the " +
            "library API, whose DV anti-join stays distributed.")
        val keyType = fullPhys.fields.find(_.name == key).getOrElse(
          throw new IllegalStateException(
            s"DV key '$key' not in physical schema at $root v=$version"))
          .dataType
        val toInternal =
          CatalystTypeConverters.createToCatalystConverter(keyType)
        entries.collect().toSeq
          .groupBy(_.getString(0))
          .map { case (f, rows) =>
            (f, rows.map(r => toInternal(r.get(1))).toSet) }
    }
    val masked = kept.filter(dvByFile.contains)
    val unmasked = kept.filterNot(dvByFile.contains)
    // masked files must surface the key column to evaluate the
    // tombstones; append it when the projection pruned it away
    val (dvKeyPhys, maskedSchema, keyAppended) = dv match {
      case Some((key, _)) if masked.nonEmpty =>
        if (physReq.fieldNames.contains(key)) (key, physReq, false)
        else (key, StructType(physReq.fields :+
          fullPhys.fields.find(_.name == key).get), true)
      case _ => ("", physReq, false)
    }
    GraftBatch.PlanState(cmTrivial = cm.isTrivial, fullPhys = fullPhys,
      physReq = physReq, masked = masked, unmasked = unmasked,
      dvByFile = dvByFile, dvKeyPhys = dvKeyPhys,
      maskedSchema = maskedSchema, keyAppended = keyAppended)
  }

  private def parquetScanOver(st: GraftBatch.PlanState,
      files: Seq[String], readSchema: StructType): ParquetScan = {
    val s = spark
    val paths = files.map(f => new HPath(s"$root/$f")).toSeq
    val index = new InMemoryFileIndex(s, paths,
      Map.empty[String, String], Some(st.fullPhys),
      FileStatusCache.getOrCreate(s), None, None)
    ParquetScan(s, s.sparkContext.hadoopConfiguration, index,
      dataSchema = st.fullPhys, readDataSchema = readSchema,
      readPartitionSchema = new StructType(),
      pushedFilters = physicalFilters,
      options = CaseInsensitiveStringMap.empty(),
      pushedAggregate = None, partitionFilters = Nil,
      dataFilters = Nil)
  }

  /** The manifest-pruning conjuncts, renamed logical → physical so the
    * parquet reader's ROW-GROUP statistics pruning bites too (the
    * manifest skips files; this skips pages inside kept files). Spark
    * re-applies every predicate above the scan, so dropping an
    * untranslatable node stays conservative. */
  private lazy val physicalFilters: Array[Filter] = {
    val fs = SnapshotTable.fsOf(spark, root)
    val cm = SnapshotTable.colmapOf(fs, root, version)
    def tr(f: Filter): Option[Filter] = f match {
      case EqualTo(c, v) => Some(EqualTo(cm.physical(c), v))
      case EqualNullSafe(c, v) => Some(EqualNullSafe(cm.physical(c), v))
      case GreaterThan(c, v) => Some(GreaterThan(cm.physical(c), v))
      case GreaterThanOrEqual(c, v) =>
        Some(GreaterThanOrEqual(cm.physical(c), v))
      case LessThan(c, v) => Some(LessThan(cm.physical(c), v))
      case LessThanOrEqual(c, v) =>
        Some(LessThanOrEqual(cm.physical(c), v))
      case In(c, vs) => Some(In(cm.physical(c), vs))
      case IsNull(c) => Some(IsNull(cm.physical(c)))
      case IsNotNull(c) => Some(IsNotNull(cm.physical(c)))
      case And(l, r) => (tr(l), tr(r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b) // conjuncts drop independently
      }
      case Or(l, r) => for (a <- tr(l); b <- tr(r)) yield Or(a, b)
      case Not(x) => tr(x).map(Not) // exact or absent, never partial
      case _ => None
    }
    pushed.flatMap(tr)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val st = state
    val plain: Array[InputPartition] =
      plainScan.map(_.toBatch.planInputPartitions()
        .map(p => GraftPlainPartition(p.asInstanceOf[FilePartition])
          : InputPartition))
        .getOrElse(Array.empty)
    // one partition per masked file: the filtering reader needs to
    // know WHICH file's entry set applies; masked files are few by
    // design (merge-touched, folded by compaction/auto-maintain)
    val fs = SnapshotTable.fsOf(spark, root)
    val maskedParts: Array[InputPartition] =
      st.masked.sorted.zipWithIndex.map { case (f, i) =>
        val abs = new HPath(s"$root/$f")
        val len = fs.getFileStatus(abs).getLen
        val pf = PartitionedFile(InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPath(abs), 0L, len,
          Array.empty[String], 0L, len,
          Map.empty[String, Any])
        GraftMaskedPartition(new FilePartition(plain.length + i,
          Array(pf)), f): InputPartition
      }.toArray
    plain ++ maskedParts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val st = state
    val plainFactory =
      plainScan.map(_.toBatch.createReaderFactory()).orNull
    val maskedFactory =
      maskedScan.map(_.toBatch.createReaderFactory()).orNull
    val keyOrdinal =
      if (st.masked.isEmpty) -1
      else st.maskedSchema.fieldIndex(st.dvKeyPhys)
    val keyType: DataType =
      if (st.masked.isEmpty) org.apache.spark.sql.types.NullType
      else st.maskedSchema.fields(keyOrdinal).dataType
    val dvB: Broadcast[Map[String, Set[Any]]] =
      spark.sparkContext.broadcast(st.dvByFile)
    new GraftReaderFactory(plainFactory, maskedFactory,
      anyMasked = st.masked.nonEmpty, keyOrdinal = keyOrdinal,
      keyType = keyType, keyAppended = st.keyAppended,
      outTypes = st.physReq.fields.map(f =>
        (f.dataType, f.nullable)), dvB = dvB)
  }
}

private[dsv2] object GraftBatch {
  case class PlanState(cmTrivial: Boolean, fullPhys: StructType,
    physReq: StructType, masked: Seq[String], unmasked: Seq[String],
    dvByFile: Map[String, Set[Any]], dvKeyPhys: String,
    maskedSchema: StructType, keyAppended: Boolean)
}

private[dsv2] case class GraftPlainPartition(inner: FilePartition)
  extends InputPartition

private[dsv2] case class GraftMaskedPartition(inner: FilePartition,
    file: String) extends InputPartition

/** The COMPLETE-pushdown metadata-aggregate scan: one partition, one
  * row, computed from the stats manifest on the driver (see
  * [[GraftScanBuilder.pushAggregation]]) — values ship EXTERNAL and
  * convert to Catalyst form in the reader, so everything stays plainly
  * serializable. */
class GraftMetaAggScan(root: String, version: Long,
    aggSchema: StructType, values: Seq[Any])
    extends org.apache.spark.sql.connector.read.Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftMetaAggScan root=$root v=$version " +
      s"aggs=${aggSchema.fieldNames.mkString("[", ", ", "]")} " +
      "(metadata-only: zero data files read)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftMetaAggPartition(values))

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = aggSchema
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] = {
        val vs = p.asInstanceOf[GraftMetaAggPartition].values
        val row = InternalRow.fromSeq(vs.zip(schema.fields).map {
          case (v, f) => CatalystTypeConverters
            .createToCatalystConverter(f.dataType)(v)
        })
        new PartitionReader[InternalRow] {
          private var served = false
          override def next(): Boolean =
            if (served) false else { served = true; true }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
  }
}

private[dsv2] case class GraftMetaAggPartition(values: Seq[Any])
  extends InputPartition

/** Dispatches plain partitions to the untouched inner parquet readers
  * (columnar when the session allows and no file is DV-masked), and
  * masked partitions to a row filter over the broadcast tombstone
  * entries. */
class GraftReaderFactory(plainFactory: PartitionReaderFactory,
    maskedFactory: PartitionReaderFactory, anyMasked: Boolean,
    keyOrdinal: Int, keyType: DataType, keyAppended: Boolean,
    outTypes: Array[(DataType, Boolean)],
    dvB: Broadcast[Map[String, Set[Any]]])
    extends PartitionReaderFactory {

  // Spark requires a scan's partitions to be uniformly columnar or
  // uniformly row-based — one masked file degrades the whole scan to
  // rows until compaction folds the vectors
  override def supportColumnarReads(p: InputPartition): Boolean =
    !anyMasked && (p match {
      case GraftPlainPartition(inner) =>
        plainFactory.supportColumnarReads(inner)
      case _ => false
    })

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = p match {
    case GraftPlainPartition(inner) =>
      plainFactory.createColumnarReader(inner)
    case other => throw new IllegalStateException(
      s"columnar read requested for $other")
  }

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case GraftPlainPartition(inner) => plainFactory.createReader(inner)
    case GraftMaskedPartition(inner, file) =>
      val hidden = dvB.value.getOrElse(file, Set.empty)
      val raw = maskedFactory.createReader(inner)
      // project the appended key column back off — downstream unsafe
      // row consumers expect exactly readSchema's arity
      val proj =
        if (!keyAppended) null
        else UnsafeProjection.create(
          outTypes.zipWithIndex.map { case ((dt, nullable), i) =>
            BoundReference(i, dt, nullable) }.toIndexedSeq)
      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean = {
          while (raw.next()) {
            val r = raw.get()
            val k = if (r.isNullAt(keyOrdinal)) null
              else r.get(keyOrdinal, keyType)
            if (k == null || !hidden.contains(k)) {
              current = if (proj == null) r else proj(r)
              return true
            }
          }
          false
        }
        override def get(): InternalRow = current
        override def close(): Unit = raw.close()
      }
  }
}
