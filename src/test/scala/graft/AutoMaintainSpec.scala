package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SnapshotTable

/** Auto-maintenance policy (round 18): a long CDC drip stays healthy
  * WITHOUT any explicit maintenance call — the post-commit hook
  * triggers compactSmall past the fragment threshold and folds
  * deletion vectors past the tombstone-density threshold, both as
  * ordinary commits on the normal machinery. */
class AutoMaintainSpec extends AnyFunSuite {
  import TestSpark._

  private def withRoot(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("automaint_spec")
      .toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  private def img(pairs: (Long, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  test("a 50-commit CDC loop with auto-maintain on keeps file count " +
      "AND tombstone rows bounded — zero explicit maintenance calls") {
    withRoot { root =>
      try {
        spark.conf.set("spark.graft.autoMaintain.enabled", "true")
        // every micro-append is a fragment at this threshold; compact
        // when more than 6 accumulate; fold DVs past 15% density
        spark.conf.set("spark.graft.autoMaintain.minFileBytes",
          (1024L * 1024).toString)
        spark.conf.set("spark.graft.autoMaintain.maxFragments", "6")
        spark.conf.set("spark.graft.autoMaintain.dvRowRatio", "0.15")
        SnapshotTable.commitWithStats(spark, root, "k", retain = 2)(_ =>
          img((1L to 64L).map(k => (k, s"v$k")): _*)
            .repartitionByRange(2, col("k")))
        (1 to 50).foreach { i =>
          if (i % 2 == 1)
            SnapshotTable.commitAppend(spark, root,
              img((1000L + i) -> s"a$i"), retain = 2)
          else
            SnapshotTable.commitMergeDV(spark, root,
              img((i % 64).toLong.max(1L) -> s"m$i"), "k",
              retain = 2)((_, b) => b)
        }
        val v = SnapshotTable.latestVersion(spark, root).get
        val files = SnapshotTable.fileCount(spark, root, v)
        // 25 appends alone would leave 25+ fragments unmaintained; the
        // policy must keep the census bounded by the trigger threshold
        // plus one inter-compaction window
        assert(files <= 16,
          s"auto-compaction failed to bound file count: $files files")
        // tombstone density stays under the fold threshold plus one
        // window (64-row table, 15% ≈ 10 rows; one window adds ≤ 25)
        val dvDir = new org.apache.hadoop.fs.Path(s"$root/v=$v/_dv")
        val fs = dvDir.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val dvRows =
          if (!fs.exists(dvDir)) 0L
          else spark.read.parquet(
            fs.listStatus(dvDir).toSeq.filter(_.getPath.getName
              .endsWith(".parquet")).map(_.getPath.toString): _*)
            .count()
        assert(dvRows <= 30,
          s"DV folding failed to bound tombstones: $dvRows entries")
        // correctness survived all the background maintenance: per-key
        // latest values intact
        val cur = SnapshotTable.read(spark, root).get
        assert(cur.where(col("k") === 1000L + 49).collect()
          .map(_.getString(1)).toSeq === Seq("a49"))
        val lastMergeI = 50
        assert(cur.where(col("k") === (lastMergeI % 64).toLong)
          .collect().map(_.getString(1)).toSeq === Seq(s"m$lastMergeI"))
      } finally {
        spark.conf.set("spark.graft.autoMaintain.enabled", "false")
      }
    }
  }

  test("foldDeletionVectors rewrites ONLY DV'd files and leaves the " +
      "version vector-free; a vector-less table is a version-free no-op") {
    withRoot { root =>
      SnapshotTable.commitWithStats(spark, root, "k", retain = 4)(_ =>
        img((1L to 8L).map(k => (k, s"v$k")): _*)
          .repartitionByRange(4, col("k")))
      SnapshotTable.commitMergeDV(spark, root, img(2L -> "B2"), "k",
        retain = 4)((_, b) => b)
      val v = SnapshotTable.latestVersion(spark, root).get
      val before = SnapshotTable.dataFiles(spark, root, v)
      val v2 = SnapshotTable.foldDeletionVectors(spark, root, retain = 4)
      assert(v2 > v)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/v=$v2/_dv")),
        "folded version must be DV-free")
      // only the DV'd file was rewritten; the rest carried by reference
      val after = SnapshotTable.dataFiles(spark, root, v2)
      assert(before.toSet.intersect(after.toSet).size
        === before.size - 1,
        "exactly the one DV'd file must be dropped from the carry")
      val cur = SnapshotTable.read(spark, root).get
      assert(cur.count() === 8)
      assert(cur.where(col("k") === 2L).collect()
        .map(_.getString(1)).toSeq === Seq("B2"))
      // no vectors → no-op, same version back
      assert(SnapshotTable.foldDeletionVectors(spark, root,
        retain = 4) === v2)
    }
  }
}
