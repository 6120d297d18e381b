package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dsv2.{GraftScan, GraftScanBuilder, GraftTable}
import graft.streaming.SnapshotTable

/** The DataSource V2 front door serves EXACTLY the library images:
  * format("graft") loads, option-pinned time travel, SQL catalog with
  * VERSION/TIMESTAMP AS OF, predicate-pushdown file pruning against
  * the stats/bloom manifest, DV application, and append writes. */
class Dsv2Spec extends AnyFunSuite {
  import TestSpark._

  private def withRoot(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("dsv2_spec").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  private def img(pairs: (Long, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select(col("k"), col("v")).orderBy("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("format(\"graft\") serves the library image, including deletion " +
      "vectors, and option pins (versionAsOf / timestampAsOf) serve " +
      "time travel") {
    withRoot { root =>
      SnapshotTable.commitWithStats(spark, root, "k", retain = 5)(_ =>
        img((1L to 8L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(4, col("k")))
      val v1 = SnapshotTable.latestVersion(spark, root).get
      // merge-on-read: hide key 3's original behind a DV entry
      SnapshotTable.commitMergeDV(spark, root, img(3L -> "B3"), "k",
        retain = 5)((_, b) => b)
      val v2 = SnapshotTable.latestVersion(spark, root).get

      val door = spark.read.format("graft").load(root)
      assert(rowsOf(door) === rowsOf(SnapshotTable.read(spark, root).get))
      assert(rowsOf(door).toMap.apply(3L) === "B3",
        "the DV'd image must flow through the front door")

      val pinned = spark.read.format("graft")
        .option("versionAsOf", v1.toString).load(root)
      assert(rowsOf(pinned)
        === rowsOf(SnapshotTable.readVersion(spark, root, v1)))

      val ts = SnapshotTable.commitTimestamp(spark, root, v2)
      val byTs = spark.read.format("graft")
        .option("timestampAsOf", ts.toString).load(root)
      assert(rowsOf(byTs)
        === rowsOf(SnapshotTable.readVersion(spark, root, v2)))

      // snapshot isolation: the loaded frame is pinned — a commit
      // landing after the load must not change what it serves
      val before = spark.read.format("graft").load(root)
      SnapshotTable.commitAppend(spark, root, img(99L -> "late"),
        retain = 5)
      assert(!rowsOf(before).exists(_._1 == 99L))
    }
  }

  test("pushed range + point predicates PRUNE FILES through the scan " +
      "(filesRead < filesTotal surfaced in the scan description), " +
      "results stay exact, and untranslatable predicates prune nothing") {
    withRoot { root =>
      // range-clustered with stats AND bloom on k: both pruning paths
      SnapshotTable.commitWithSkipping(spark, root, Seq("k"), Seq("k"),
        bloomBits = 4096, retain = 3)(_ =>
        img((1L to 400L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(8, col("k")))
      val v = SnapshotTable.latestVersion(spark, root).get

      // drive the public pushdown surface directly — the counters the
      // description exposes are the spec's observable
      def scanFor(filters: org.apache.spark.sql.sources.Filter*)
          : GraftScan = {
        val b = new GraftScanBuilder(root, v,
          SnapshotTable.schemaOfVersion(spark, root, v))
        b.pushFilters(filters.toArray)
        b.build().asInstanceOf[GraftScan]
      }
      import org.apache.spark.sql.sources._
      val range = scanFor(GreaterThanOrEqual("k", 10L),
        LessThanOrEqual("k", 60L))
      assert(range.filesRead < range.filesTotal,
        s"range predicate must skip files: ${range.description()}")
      assert(range.description().contains(
        s"filesRead=${range.filesRead}/${range.filesTotal}"))
      val point = scanFor(EqualTo("k", 250L))
      assert(point.filesRead < point.filesTotal)
      val opaque = scanFor(StringStartsWith("v", "v1"))
      assert(opaque.filesRead === opaque.filesTotal,
        "untranslatable predicates must prune nothing (conservative)")

      // end-to-end: the same predicate through the SQL surface returns
      // exactly the matching rows and shows the pushdown in the plan
      val df = spark.read.format("graft").load(root)
        .where(col("k") >= 10L && col("k") <= 60L)
      assert(df.count() === 51)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("pushedFilters=[GreaterThanOrEqual") &&
        plan.contains("BatchScan"),
        s"pushdown must surface in the native batch plan:\n$plan")
      // round 19: the scan is a NATIVE DSv2 batch — vectorized parquet
      // straight to columnar, no V1 Row conversion seam in the plan
      assert(plan.contains("ColumnarToRow"),
        s"a DV-free scan must serve COLUMNAR batches:\n$plan")
      // column pruning reaches the inner scan: a 1-column projection
      // serves without error and with the right values
      assert(spark.read.format("graft").load(root)
        .select("v").where(col("v") === "v42").count() === 1)
    }
  }

  test("LIMIT pushdown (round-20): a bare LIMIT plans only the fewest " +
      "files whose manifest row counts cover it; DVs or filters keep " +
      "the full set (exactness gates)") {
    withRoot { root =>
      SnapshotTable.commitWithStats(spark, root, "k", retain = 5)(_ =>
        img((1L to 400L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(8, col("k")))
      val v = SnapshotTable.latestVersion(spark, root).get
      def scanWithLimit(l: Int,
          filters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
          : GraftScan = {
        val b = new GraftScanBuilder(root, v,
          SnapshotTable.schemaOfVersion(spark, root, v))
        if (filters.nonEmpty) b.pushFilters(filters.toArray)
        b.pushLimit(l)
        b.build().asInstanceOf[GraftScan]
      }
      // 400 rows over 8 files → LIMIT 10 needs exactly one file
      val one = scanWithLimit(10)
      assert(one.filesRead === 1 && one.filesTotal === 8,
        s"LIMIT 10 must plan one covering file: ${one.description()}")
      // a limit above the table size keeps every file (trivial cover)
      assert(scanWithLimit(1000).filesRead === 8)
      // with pushed filters the guard refuses (filters are residual —
      // a row-count cover could under-deliver after filtering)
      import org.apache.spark.sql.sources._
      val filtered = scanWithLimit(10, Seq(GreaterThanOrEqual("k", 1L)))
      assert(filtered.filesRead > 1 || filtered.filesTotal < 8,
        "limit must not narrow beneath residual filters")
      // end-to-end: the SQL LIMIT serves the right number of rows and
      // the executed scan read fewer files than the table holds
      val df = spark.read.format("graft").load(root).limit(7)
      assert(df.count() === 7)
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.scan
      }.collect { case g: GraftScan => g }
      assert(scans.nonEmpty && scans.head.filesRead < 8,
        s"executed LIMIT scan must be file-narrowed: " +
          scans.map(_.description()).mkString("; "))

      // DV gate: tombstones mean manifest counts over-report visible
      // rows — the cover must refuse and the full set serve
      SnapshotTable.commitMergeDV(spark, root, img(3L -> "B3"), "k",
        retain = 5)((_, b) => b)
      val v2 = SnapshotTable.latestVersion(spark, root).get
      val b2 = new GraftScanBuilder(root, v2,
        SnapshotTable.schemaOfVersion(spark, root, v2))
      b2.pushLimit(10)
      val dvScan = b2.build().asInstanceOf[GraftScan]
      assert(dvScan.filesRead === dvScan.filesTotal,
        s"DV'd version must not limit-narrow: ${dvScan.description()}")
      assert(spark.read.format("graft").load(root).limit(5).count() === 5)
    }
  }

  test("TopN pushdown (round-20): ORDER BY c DESC LIMIT k plans only " +
      "the files that can hold a top-k row; nulls-first orderings and " +
      "DV'd versions refuse; results stay exact end-to-end") {
    withRoot { root =>
      SnapshotTable.commitWithStats(spark, root, "k", retain = 5)(_ =>
        img((1L to 400L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(8, col("k")))
      val v = SnapshotTable.latestVersion(spark, root).get
      def scanTop(desc: Boolean, k: Int): GraftScan = {
        import org.apache.spark.sql.connector.expressions.{
          Expressions, NullOrdering, SortDirection}
        val b = new GraftScanBuilder(root, v,
          SnapshotTable.schemaOfVersion(spark, root, v))
        // real SQL defaults: DESC ships NULLS_LAST, ASC NULLS_FIRST —
        // the ASC arm exercises the nulls-first path on null-free data
        // (the exists-nulls refusal guard passes vacuously)
        val dir = if (desc) SortDirection.DESCENDING
          else SortDirection.ASCENDING
        val no = if (desc) NullOrdering.NULLS_LAST
          else NullOrdering.NULLS_FIRST
        assert(b.pushTopN(Array(Expressions.sort(
          Expressions.column("k"), dir, no)), k))
        b.build().asInstanceOf[GraftScan]
      }
      // 400 rows / 8 range-disjoint files: top-10 DESC lives in the
      // last file, bottom-10 ASC in the first
      val top = scanTop(desc = true, k = 10)
      assert(top.filesRead === 1 && top.filesTotal === 8,
        s"DESC top-10 must plan one file: ${top.description()}")
      val bottom = scanTop(desc = false, k = 10)
      assert(bottom.filesRead === 1,
        s"ASC top-10 must plan one file: ${bottom.description()}")
      // spanning k: top-60 needs two files
      assert(scanTop(desc = true, k = 60).filesRead === 2)
      // end-to-end: the SQL ORDER BY ... LIMIT returns the exact rows
      // and the executed scan was file-narrowed
      val df = spark.read.format("graft").load(root)
        .orderBy(col("k").desc).limit(5)
      assert(df.collect().map(_.getLong(0)).toSeq
        === Seq(400L, 399L, 398L, 397L, 396L))
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.scan
      }.collect { case g: GraftScan => g }
      assert(scans.nonEmpty && scans.head.filesRead < 8,
        s"executed TopN scan must be file-narrowed: " +
          scans.map(_.description()).mkString("; "))
      // DV gate: tombstoned rows invalidate the non-null row counts
      SnapshotTable.commitMergeDV(spark, root, img(400L -> "B400"),
        "k", retain = 5)((_, b) => b)
      val v2 = SnapshotTable.latestVersion(spark, root).get
      val b2 = new GraftScanBuilder(root, v2,
        SnapshotTable.schemaOfVersion(spark, root, v2))
      import org.apache.spark.sql.connector.expressions.{
        Expressions, NullOrdering, SortDirection}
      assert(b2.pushTopN(Array(Expressions.sort(Expressions.column("k"),
        SortDirection.DESCENDING, NullOrdering.NULLS_LAST)), 10))
      val dvScan = b2.build().asInstanceOf[GraftScan]
      assert(dvScan.filesRead === dvScan.filesTotal,
        s"DV'd version must not TopN-narrow: ${dvScan.description()}")
      assert(spark.read.format("graft").load(root)
        .orderBy(col("k").desc).limit(1).collect().head.getString(1)
        === "B400")
    }
  }

  test("CLUSTERED door writes (round-20): INSERT INTO requests range " +
      "distribution + ordering on the table's stats columns, so " +
      "door-appended files carry disjoint ranges and a range probe " +
      "prunes them") {
    withRoot { root =>
      withWh { wh =>
        SnapshotTable.commitWithStats(spark, s"$wh/t_cl", "k",
          retain = 5)(_ => img(0L -> "seed"))
        spark.conf.set("spark.sql.catalog.graft_w",
          "graft.dsv2.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graft_w.warehouse", wh)
        try {
          // tiny advisory size → the range-distributed INSERT fans
          // out to several files even at spec scale
          spark.conf.set(
            "spark.graft.dsv2.writeAdvisoryPartitionBytes", "2048")
          spark.sql(
            """INSERT INTO graft_w.t_cl
              |SELECT id AS k, concat('v', id) AS v
              |FROM range(1, 2001)""".stripMargin)
          val v = SnapshotTable.latestVersion(spark, s"$wh/t_cl").get
          assert(SnapshotTable.fileCount(spark, s"$wh/t_cl", v) >= 3,
            "precondition: the clustered INSERT landed several files")
          // the door-written files must prune under a range probe —
          // natural arrival-order partitioning could not
          val b = new GraftScanBuilder(s"$wh/t_cl", v,
            SnapshotTable.schemaOfVersion(spark, s"$wh/t_cl", v))
          import org.apache.spark.sql.sources._
          b.pushFilters(Array(
            GreaterThanOrEqual("k", 100L), LessThanOrEqual("k", 160L)))
          val probe = b.build().asInstanceOf[GraftScan]
          assert(probe.filesRead < probe.filesTotal,
            s"door-written files must carry disjoint ranges: " +
              probe.description())
          // image correctness end-to-end
          assert(spark.sql(
            "SELECT count(*) FROM graft_w.t_cl WHERE k BETWEEN 100 AND 160")
            .first().getLong(0) === 61L)
          assert(spark.table("graft_w.t_cl").count() === 2001L)
        } finally {
          spark.conf.unset("spark.graft.dsv2.writeAdvisoryPartitionBytes")
        }
      }
    }
  }

  private def withWh(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("dsv2_wh").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("the scan reports manifest statistics: numRows/sizeInBytes come " +
      "from metadata, shrink under pruning, and Catalyst BROADCASTS a " +
      "small front-door relation in a join") {
    withRoot { root =>
      SnapshotTable.commitWithStats(spark, root, "k", retain = 3)(_ =>
        img((1L to 400L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(8, col("k")))
      val v = SnapshotTable.latestVersion(spark, root).get
      def scanFor(filters: org.apache.spark.sql.sources.Filter*)
          : GraftScan = {
        val b = new GraftScanBuilder(root, v,
          SnapshotTable.schemaOfVersion(spark, root, v))
        b.pushFilters(filters.toArray)
        b.build().asInstanceOf[GraftScan]
      }
      val full = scanFor().estimateStatistics()
      assert(full.numRows.getAsLong === 400L)
      assert(full.sizeInBytes.getAsLong > 0L)
      import org.apache.spark.sql.sources._
      val pruned = scanFor(LessThanOrEqual("k", 50L))
        .estimateStatistics()
      assert(pruned.numRows.getAsLong < 400L,
        "pruned scan must report the kept files' rows only")
      // end-to-end: the sized relation rides into join planning — a
      // small graft table joined against a big frame broadcasts
      val big = spark.range(0L, 200000L).toDF("k")
      val joined = big.join(spark.read.format("graft").load(root), "k")
      assert(joined.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "small front-door relation must plan as the broadcast side:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
      assert(joined.count() === 400)
    }
  }

  test("change-feed option: .option(\"changesFrom\"/\"changesTo\"/" +
      "\"changeKey\") serves exactly the library readChanges diff " +
      "through the front door, with column pruning") {
    withRoot { root =>
      SnapshotTable.commitWithStats(spark, root, "k", retain = 6)(_ =>
        img((1L to 6L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(2, col("k")))
      val v1 = SnapshotTable.latestVersion(spark, root).get
      SnapshotTable.commitMergeDV(spark, root,
        img(2L -> "B2", 9L -> "new9"), "k", retain = 6)((_, b) => b)
      val v2 = SnapshotTable.latestVersion(spark, root).get
      val door = spark.read.format("graft")
        .option("changesFrom", v1.toString)
        .option("changesTo", v2.toString)
        .option("changeKey", "k").load(root)
        .select("_change_type", "k", "v")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getString(2))).toSet
      val lib = SnapshotTable.readChanges(spark, root, v1, v2, "k")
        .select("_change_type", "k", "v")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getString(2))).toSet
      assert(door === lib)
      assert(door === Set(("update_preimage", 2L, "v2"),
        ("update_postimage", 2L, "B2"), ("insert", 9L, "new9")))
      // changesTo defaults to latest; pruned projection serves
      assert(spark.read.format("graft")
        .option("changesFrom", v1.toString).option("changeKey", "k")
        .load(root).select("_change_type").count() === 3)
      // missing changeKey fails loudly
      intercept[IllegalArgumentException] {
        spark.read.format("graft")
          .option("changesFrom", v1.toString).load(root)
      }
    }
  }

  test("SQL catalog: SELECT with VERSION AS OF / TIMESTAMP AS OF, " +
      "INSERT INTO appends through commitAppend, and listTables sees " +
      "committed tables") {
    withRoot { wh =>
      spark.conf.set("spark.sql.catalog.graft_t",
        "graft.dsv2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft_t.warehouse", wh)
      val root = s"$wh/events_t"
      SnapshotTable.commitWithStats(spark, root, "k", retain = 5)(_ =>
        img((1L to 5L).map(k => (k, s"v$k")): _*))
      val v1 = SnapshotTable.latestVersion(spark, root).get
      SnapshotTable.commitMerge(spark, root, img(2L -> "B2"), "k",
        retain = 5)((_, b) => b)

      assert(spark.sql("SELECT count(*) AS n FROM graft_t.events_t")
        .first().getLong(0) === 5)
      assert(spark.sql(
        "SELECT v FROM graft_t.events_t WHERE k = 2").first()
        .getString(0) === "B2")
      assert(spark.sql(
        s"SELECT v FROM graft_t.events_t VERSION AS OF $v1 WHERE k = 2")
        .first().getString(0) === "v2")
      val ts = SnapshotTable.commitTimestamp(spark, root, v1)
      val tsLit = new java.sql.Timestamp(ts).toString
      assert(spark.sql(
        s"SELECT v FROM graft_t.events_t TIMESTAMP AS OF '$tsLit' " +
          "WHERE k = 2").first().getString(0) === "v2")

      // write door: INSERT INTO rides commitAppend (a new version, no
      // history rewrite)
      val vBefore = SnapshotTable.latestVersion(spark, root).get
      spark.sql("INSERT INTO graft_t.events_t VALUES (9, 'v9')")
      val vAfter = SnapshotTable.latestVersion(spark, root).get
      assert(vAfter > vBefore)
      assert(spark.sql("SELECT count(*) AS n FROM graft_t.events_t")
        .first().getLong(0) === 6)
      assert(SnapshotTable.newFiles(spark, root, vAfter).nonEmpty &&
        SnapshotTable.newFiles(spark, root, vAfter).size <
          SnapshotTable.fileCount(spark, root, vAfter),
        "INSERT INTO must append O(delta), carrying history by reference")

      // df-API write door
      img(10L -> "v10").write.format("graft").mode("append").save(root)
      assert(spark.read.format("graft").load(root).count() === 7)

      assert(spark.sql("SHOW TABLES IN graft_t").collect()
        .map(_.getString(1)).contains("events_t"))
    }
  }

  test("DELETE FROM SQL: point deletes land as merge-on-read DV " +
      "commits — zero files rewritten, rows tombstoned, time travel " +
      "intact; non-point predicates are rejected up front") {
    withRoot { wh =>
      spark.conf.set("spark.sql.catalog.graft_d",
        "graft.dsv2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft_d.warehouse", wh)
      // front-door writes honor the session horizon — the test needs
      // the pre-delete versions retained for the time-travel check
      spark.conf.set("spark.graft.retain", "8")
      val root = s"$wh/t_del"
      SnapshotTable.commitWithStats(spark, root, "k", retain = 8)(_ =>
        img((1L to 8L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(3, col("k")))
      val v1 = SnapshotTable.latestVersion(spark, root).get
      val filesBefore = SnapshotTable.dataFiles(spark, root, v1).toSet

      spark.sql("DELETE FROM graft_d.t_del WHERE k = 3")
      spark.sql("DELETE FROM graft_d.t_del WHERE k IN (5, 6, 99)")
      val v2 = SnapshotTable.latestVersion(spark, root).get
      // merge-on-read: every original file carried by reference
      assert(filesBefore.subsetOf(
        SnapshotTable.dataFiles(spark, root, v2).toSet),
        "DELETE must not rewrite data files")
      assert(spark.sql("SELECT k FROM graft_d.t_del ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 7L, 8L))
      // time travel still serves the pre-delete image
      assert(SnapshotTable.readVersion(spark, root, v1).count() === 8)
      // arbitrary predicates are not silently mis-deleted
      val e = intercept[Exception] {
        spark.sql("DELETE FROM graft_d.t_del WHERE v LIKE 'v%'")
      }
      assert(e.getMessage.contains("DELETE") ||
        e.getMessage.toLowerCase.contains("delete"), e.getMessage)
      // compaction folds the tombstones physically
      SnapshotTable.compact(spark, root, targetFiles = 2, retain = 8)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val vC = SnapshotTable.latestVersion(spark, root).get
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/v=$vC/_dv")))
      assert(spark.sql("SELECT count(*) FROM graft_d.t_del")
        .first().getLong(0) === 5)
      // TRUNCATE = one empty-image commit; restore undoes it
      val vPre = SnapshotTable.latestVersion(spark, root).get
      spark.sql("TRUNCATE TABLE graft_d.t_del")
      assert(spark.sql("SELECT count(*) FROM graft_d.t_del")
        .first().getLong(0) === 0)
      SnapshotTable.restore(spark, root, vPre, retain = 8)
      assert(spark.sql("SELECT count(*) FROM graft_d.t_del")
        .first().getLong(0) === 5)
      spark.conf.set("spark.graft.retain", "2")
    }
  }

  test("RUNTIME V2 filtering: a join against a filtered dimension " +
      "narrows the fact scan's file set at execution time through the " +
      "stats/bloom manifest (round 19 — DPP for graft tables)") {
    withRoot { root =>
      try {
      // fact: 40k keys range-clustered into 8 files, stats+bloom on
      // k — big enough that the DIM side broadcasts (the scan reports
      // manifest stats, so relative sizes drive the join planning)
      import spark.implicits._
      SnapshotTable.commitWithSkipping(spark, root, Seq("k"), Seq("k"),
        bloomBits = 65536, retain = 3)(_ =>
        spark.range(1, 40001).toDF("k")
          .withColumn("v", concat(lit("v"), col("k")))
          .repartitionByRange(8, col("k")))
      // dim: parquet-backed (a local Seq constant-folds into a
      // LocalRelation and DPP never sees a filterable side). The
      // filter is on a NON-join column, so Catalyst can infer NO
      // static k-predicate onto the fact — only the RUNTIME filter
      // (the dim's surviving key VALUES, which concentrate in one
      // fact file's range) can prune files
      val dimPath = s"$root-dim"
      (1L to 40000L).map(k =>
        (k, if (k >= 3000 && k <= 3045) "hot" else "cold"))
        .toDF("k", "cat")
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
      val fact = spark.read.format("graft").load(root)
      val joined = fact.join(dim.where(col("cat") === "hot"), Seq("k"))
      // execute THIS plan (count() would build its own QueryExecution
      // with a fresh, never-filtered scan instance)
      assert(joined.collect().length === 46)
      // the executed plan surfaces the scan's counters (the scan
      // object itself hides inside AQE query stages): the description
      // must show RUNTIME narrowing with EMPTY static pushdown — the
      // dim's filter was not inferable onto k, so only the dynamic
      // pruning expression can have skipped files
      val plan = joined.queryExecution.executedPlan.toString
      val m = "filesRead=(\\d+)/(\\d+) pushedFilters=\\[\\]".r
        .findFirstMatchIn(plan).getOrElse(fail(
          s"no graft scan with empty static pushdown in plan:\n" +
            plan.take(3000)))
      assert(m.group(1).toInt < m.group(2).toInt,
        s"runtime filter must skip files: ${m.matched}\n" +
          plan.take(3000))
      assert(plan.contains("dynamicpruningexpression"),
        s"the narrowing must come from a runtime filter:\n" +
          plan.take(3000))
      } finally org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$root-dim"))
    }
  }

  test("METADATA-ONLY aggregate pushdown: unfiltered COUNT(*)/MIN/MAX " +
      "answer from the stats manifest (zero data files read), and " +
      "every exactness hazard — filters, deletion vectors, stats-less " +
      "files — falls back to the real scan (round 19)") {
    withRoot { root =>
      SnapshotTable.commitWithStatsCols(spark, root, Seq("k", "v"),
        retain = 6)(_ =>
        img((1L to 400L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(8, col("k")))
      val door = () => spark.read.format("graft").load(root)
      def planOf(df: org.apache.spark.sql.DataFrame): String = {
        df.collect(); df.queryExecution.executedPlan.toString
      }
      // the happy path: answered from metadata, no parquet scan at all
      val aggDf = door().agg(count(lit(1)).as("n"), min("k").as("mn"),
        max("k").as("mx"))
      val plan = planOf(aggDf)
      assert(plan.contains("GraftMetaAggScan"),
        s"unfiltered count/min/max must push to metadata:\n$plan")
      assert(!plan.contains("GraftSnapshotScan"))
      val r = aggDf.collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2))
        === ((400L, 1L, 400L)))
      // min/max on a STRING column: manifest ranges are Spark-agg
      // exact, never footer-truncated
      val sDf = door().agg(min("v"), max("v"))
      assert(planOf(sDf).contains("GraftMetaAggScan"))
      assert(sDf.collect().head.toSeq === Seq("v1", "v99"))
      // SUM of an integral stats column (round 20): per-file sum__
      // records fold to the exact long sum with zero parquet scans
      val sumDf = door().agg(sum("k").as("s"), count(lit(1)).as("n"))
      val sumPlan = planOf(sumDf)
      assert(sumPlan.contains("GraftMetaAggScan"),
        s"unfiltered integral SUM must push to metadata:\n$sumPlan")
      assert(!sumPlan.contains("GraftSnapshotScan"))
      assert(sumDf.collect().head.toSeq === Seq(80200L, 400L))
      // a FILTER disqualifies (all predicates are residual here)
      assert(!planOf(door().where(col("k") > 10)
        .agg(count(lit(1)))).contains("GraftMetaAggScan"))
      // AVG / SUM-of-string / GROUP BY are not metadata-answerable
      assert(!planOf(door().agg(avg("k"))).contains("GraftMetaAggScan"))
      assert(!planOf(door().groupBy("v").agg(count(lit(1))))
        .contains("GraftMetaAggScan"))
      // DELETION VECTORS hide rows -> metadata would lie; fall back,
      // and the fallen-back answer reflects the tombstones
      SnapshotTable.commitMergeDV(spark, root, img(5L -> "B5"), "k",
        retain = 6)((_, b) => b.limit(0)) // point delete of k=5
      val afterDv = door().agg(count(lit(1)).as("n"))
      assert(!planOf(afterDv).contains("GraftMetaAggScan"))
      assert(afterDv.collect().head.getLong(0) === 399L)
      // fold the vectors away: metadata answers again, tombstone-aware
      SnapshotTable.foldDeletionVectors(spark, root, retain = 6)
      val refolded = door().agg(count(lit(1)), min("k"), max("k"))
      assert(planOf(refolded).contains("GraftMetaAggScan"))
      assert(refolded.collect().head.toSeq === Seq(399L, 1L, 400L))
    }
  }

  test("DISTRIBUTED DV application: above " +
      "spark.graft.dsv2.maxDvBroadcastEntries the door degrades to " +
      "per-file shard anti-joins (round-20 verdict item 2) — the " +
      "image still matches the library read exactly, with no driver " +
      "materialization of the tombstone set") {
    withRoot { root =>
      SnapshotTable.commitWithStats(spark, root, "k", retain = 5)(_ =>
        img((1L to 40L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(4, col("k")))
      SnapshotTable.commitMergeDV(spark, root,
        img(2L -> "B2", 5L -> "B5", 17L -> "B17", 33L -> "B33"), "k",
        retain = 5)((_, b) => b)
      try {
        // cap of 1 forces EVERY entry set over the broadcast bound —
        // the old behavior refused here; now the scan must serve
        spark.conf.set("spark.graft.dsv2.maxDvBroadcastEntries", "1")
        val door = spark.read.format("graft").load(root)
        val lib = SnapshotTable.read(spark, root).get
        assert(rowsOf(door) === rowsOf(lib),
          "over-cap DV image must match the library anti-join exactly")
        assert(rowsOf(door).toMap.apply(2L) === "B2")
        assert(door.count() === 40L)
        // pushed predicates still prune/serve correctly in shard mode
        assert(rowsOf(spark.read.format("graft").load(root)
          .where(col("k") === 17L)) === Seq((17L, "B17")))
        // the shard artifact was staged (the distributed path ran)
        val shards = new java.io.File(
          graft.ops.Artifacts.root(spark).stripPrefix("file:"),
          "dv_shards")
        assert(shards.exists && shards.listFiles().nonEmpty,
          "per-file DV shards must be staged under the artifact store")
      } finally spark.conf
        .unset("spark.graft.dsv2.maxDvBroadcastEntries")
      // back under the bound: the broadcast path serves the same image
      assert(rowsOf(spark.read.format("graft").load(root)).toMap
        .apply(2L) === "B2")
    }
  }

  test("timestampAsOf option strings parse in UTC: the same string " +
      "resolves the same version under any driver default timezone " +
      "(round-19 advice)") {
    val tzs = Seq("GMT+9", "GMT-7", "UTC").map(
      java.util.TimeZone.getTimeZone)
    val saved = java.util.TimeZone.getDefault
    try {
      // pure parse: one string, three forced defaults, one answer
      val parsed = tzs.map { tz =>
        java.util.TimeZone.setDefault(tz)
        GraftTable.parseUtcMillis("2026-08-16 09:00:00")
      }
      assert(parsed.distinct.size === 1,
        s"timestampAsOf parse must not depend on the driver zone: $parsed")
      assert(parsed.head ===
        java.time.Instant.parse("2026-08-16T09:00:00Z").toEpochMilli)
      // explicit offsets are honored, date-only means UTC midnight
      assert(GraftTable.parseUtcMillis("2026-08-16T09:00:00+02:00") ===
        java.time.Instant.parse("2026-08-16T07:00:00Z").toEpochMilli)
      assert(GraftTable.parseUtcMillis("2026-08-16") ===
        java.time.Instant.parse("2026-08-16T00:00:00Z").toEpochMilli)
    } finally java.util.TimeZone.setDefault(saved)
    // end-to-end: a UTC-rendered commit timestamp pins its version
    // through the option regardless of the driver default
    withRoot { root =>
      SnapshotTable.commit(spark, root, retain = 5)(_ => img(1L -> "a"))
      val v1 = SnapshotTable.latestVersion(spark, root).get
      Thread.sleep(5)
      SnapshotTable.commitAppend(spark, root, img(2L -> "b"), retain = 5)
      val ts = SnapshotTable.commitTimestamp(spark, root, v1)
      val tsStr = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ts))
      try {
        java.util.TimeZone.setDefault(
          java.util.TimeZone.getTimeZone("GMT+9"))
        assert(rowsOf(spark.read.format("graft")
          .option("timestampAsOf", tsStr).load(root))
          === rowsOf(SnapshotTable.readVersion(spark, root, v1)))
      } finally java.util.TimeZone.setDefault(saved)
    }
  }

  test("front-door writes honor the table's recorded retention " +
      "horizon: a default-conf SQL INSERT can no longer vacuum the " +
      "history a retain=8 library writer was preserving (round-19 " +
      "advice)") {
    withRoot { root =>
      assert(spark.conf.get("spark.graft.retain", "2") === "2",
        "test precondition: session horizon at its default")
      SnapshotTable.commit(spark, root, retain = 8)(_ => img(1L -> "a"))
      SnapshotTable.commitAppend(spark, root, img(2L -> "b"), retain = 8)
      SnapshotTable.commitAppend(spark, root, img(3L -> "c"), retain = 8)
      val before = SnapshotTable.committedVersions(spark, root)
      assert(before.size === 3)
      assert(SnapshotTable.retentionHorizon(spark, root) === 8)
      // front-door append from a session that never set the conf: the
      // recorded horizon (8) must win over the session default (2)
      img(4L -> "d").write.format("graft").mode("append").save(root)
      val after = SnapshotTable.committedVersions(spark, root)
      assert(before.toSet.subsetOf(after.toSet),
        s"front-door write vacuumed preserved history: $before -> $after")
      assert(after.size === 4)
      // every commit shape carries the horizon forward
      assert(SnapshotTable.retentionHorizon(spark, root) === 8)
    }
  }

  test("ALTER TABLE SQL: ADD / RENAME / DROP COLUMN land as " +
      "metadata-only column-mapping commits through the catalog") {
    withRoot { wh =>
      spark.conf.set("spark.sql.catalog.graft_a",
        "graft.dsv2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft_a.warehouse", wh)
      val root = s"$wh/t_alter"
      SnapshotTable.commitWithStats(spark, root, "k", retain = 8)(_ =>
        img((1L to 5L).map(k => (k, s"v$k")): _*))
      def segCount: Int = {
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).count(st => st.isDirectory &&
          st.getPath.getName.startsWith("seg-"))
      }
      val segsBefore = segCount
      spark.sql("ALTER TABLE graft_a.t_alter RENAME COLUMN v TO label")
      spark.sql("ALTER TABLE graft_a.t_alter ADD COLUMN score DOUBLE")
      assert(spark.sql(
        "SELECT label, score FROM graft_a.t_alter WHERE k = 3")
        .collect().map(r => (r.getString(0), r.isNullAt(1))).toSeq
        === Seq(("v3", true)))
      spark.sql("ALTER TABLE graft_a.t_alter DROP COLUMN score")
      assert(!spark.table("graft_a.t_alter").columns.contains("score"))
      assert(spark.table("graft_a.t_alter").columns.toSeq
        === Seq("k", "label"))
      assert(segCount === segsBefore,
        "DDL must be metadata-only — zero data segments written")
    }
  }
}
