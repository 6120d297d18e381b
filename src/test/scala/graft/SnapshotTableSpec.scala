package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SnapshotTable

/** Snapshot-isolation guarantees of the versioned table surface:
  * pinned readers survive concurrent commits, lost races fail loudly,
  * retention vacuums only past the horizon, committed versions are
  * time-travelable. */
class SnapshotTableSpec extends AnyFunSuite {
  import TestSpark._

  private def withRoot(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("snap_spec").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  private def img(pairs: (Long, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  test("a reader pinned pre-commit still reads its snapshot after " +
      "a later commit lands") {
    withRoot { root =>
      SnapshotTable.commit(spark, root)(_ => img(1L -> "a", 2L -> "b"))
      val pinned = SnapshotTable.read(spark, root).get
      assert(pinned.count() === 2)
      SnapshotTable.commit(spark, root)(st =>
        st.get.where(col("k") =!= 2L).unionByName(img(3L -> "c")))
      // the pinned frame re-collects from its IMMUTABLE version dir —
      // same rows as before the commit, no FileNotFound, no new rows
      assert(pinned.orderBy("k").collect().map(_.getLong(0)).toSeq
        === Seq(1L, 2L))
      // a fresh resolve sees the new image
      assert(SnapshotTable.read(spark, root).get
        .orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    }
  }

  test("a commit whose base was superseded mid-flight fails loudly " +
      "and leaves the winner's version current") {
    withRoot { root =>
      SnapshotTable.commit(spark, root)(_ => img(1L -> "a"))
      val e = intercept[IllegalStateException] {
        SnapshotTable.commit(spark, root) { _ =>
          // a second writer lands while this commit is computing
          SnapshotTable.commit(spark, root)(_ => img(2L -> "winner"))
          img(3L -> "loser")
        }
      }
      assert(e.getMessage.contains("conflict"))
      assert(SnapshotTable.read(spark, root).get
        .select("v").collect().map(_.getString(0)).toSeq === Seq("winner"))
      // the loser's orphan dir is invisible: no _COMMITTED marker
      assert(SnapshotTable.latestVersion(spark, root) === Some(1L))
    }
  }

  test("retention vacuums only versions past the horizon; survivors " +
      "stay time-travelable") {
    withRoot { root =>
      (1 to 3).foreach(i =>
        SnapshotTable.commit(spark, root, retain = 2)(_ =>
          img(i.toLong -> s"v$i")))
      // v=0 vacuumed, v=1 (previous) and v=2 (current) alive
      assert(SnapshotTable.latestVersion(spark, root) === Some(2L))
      assert(intercept[IllegalArgumentException](
        SnapshotTable.readVersion(spark, root, 0L))
        .getMessage.contains("not committed"))
      assert(SnapshotTable.readVersion(spark, root, 1L)
        .select("v").first().getString(0) === "v2")
      assert(SnapshotTable.readVersion(spark, root, 2L)
        .select("v").first().getString(0) === "v3")
    }
  }

  test("sink_snapshot_merge equals the foreachBatch upsert sink's " +
      "converged image") {
    val a = q("sink_snapshot_merge")
    val b = q("sink_foreach_upsert")
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0)
  }
}
