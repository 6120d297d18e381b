package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Artifacts

/** The cluster-safe artifact store (round-12): one configurable root
  * (`spark.graft.artifactRoot`) for every materialized shared artifact,
  * with a temp-then-rename publish. These tests pin the deployment
  * contract the round-11 review asked for: two sessions pointed at the
  * same shared root share ONE build; distinct content keys never
  * collide; the default (conf unset) keeps per-JVM semantics; the
  * raw-files builder refuses to publish a partial directory; rewrite
  * pruning works locally and is refused on shared roots. */
class ArtifactStoreSpec extends AnyFunSuite {
  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_artspec").toString

  private def sessionWithRoot(root: String) = {
    val s = TestSpark.spark.newSession()
    s.conf.set(Artifacts.RootConf, root)
    s
  }

  test("two sessions with the same shared root share one build") {
    val root = freshRoot()
    val a = sessionWithRoot(root)
    val b = sessionWithRoot(root)
    val before = Artifacts.buildsPerformed.get()
    val d1 = Artifacts.parquet(a, "spec", "k1")(
      a.range(5).toDF("id"))
    assert(d1.count() === 5)
    assert(Artifacts.buildsPerformed.get() === before + 1)
    // second session, same root + key: must read the published table,
    // never evaluate the by-name builder
    val d2 = Artifacts.parquet(b, "spec", "k1")(
      sys.error("builder must not run — artifact is published"))
    assert(d2.count() === 5)
    assert(Artifacts.buildsPerformed.get() === before + 1)
    // published layout is clean: the key dir with _SUCCESS, no
    // leftover .build-* temp siblings
    val fam = new java.io.File(root, "spec")
    assert(new java.io.File(fam, "k1/_SUCCESS").isFile)
    assert(fam.listFiles().map(_.getName).toSet === Set("k1"))
  }

  test("distinct keys and families do not collide") {
    val root = freshRoot()
    val s = sessionWithRoot(root)
    val d1 = Artifacts.parquet(s, "specA", "k")(s.range(3).toDF("id"))
    val d2 = Artifacts.parquet(s, "specB", "k")(s.range(7).toDF("id"))
    val d3 = Artifacts.parquet(s, "specA", "k2")(s.range(11).toDF("id"))
    assert(d1.count() === 3)
    assert(d2.count() === 7)
    assert(d3.count() === 11)
  }

  test("default root (conf unset) still materializes once per JVM") {
    val s = TestSpark.spark
    assert(!Artifacts.isShared(s))
    val key = s"default_${System.nanoTime()}"
    val before = Artifacts.buildsPerformed.get()
    Artifacts.parquet(s, "spec", key)(s.range(2).toDF("id")).count()
    Artifacts.parquet(s, "spec", key)(
      sys.error("must not rebuild")).count()
    assert(Artifacts.buildsPerformed.get() === before + 1)
    // and it landed under the per-JVM tmpdir root, which is a LOCAL dir
    // behind an explicit file: scheme (qualified so a cluster
    // fs.defaultFS=hdfs can never capture the default root)
    val root = Artifacts.root(s)
    assert(root.startsWith("file:"), root)
    assert(new java.io.File(new java.net.URI(root)).isDirectory, root)
  }

  test("files artifact refuses to publish on a count mismatch " +
      "(executors wrote where the driver can't see)") {
    val root = freshRoot()
    val s = sessionWithRoot(root)
    val key = s"bad_${System.nanoTime()}"
    val e = intercept[IllegalArgumentException] {
      Artifacts.files(s, "spec", key) { tmp =>
        val f = new java.io.File(tmp.toUri.getPath, "one.bin")
        val fos = new java.io.FileOutputStream(f)
        try fos.write(Array[Byte](1, 2, 3)) finally fos.close()
        2L // builder claims two files; only one is visible
      }
    }
    assert(e.getMessage.contains("expected 2"))
    // the failed build left NOTHING behind — no published dir, no
    // .build-* temp sibling (the crash path deletes its temp)
    val fam = new java.io.File(root, "spec")
    assert(!fam.exists() || fam.listFiles().isEmpty,
      Option(fam.listFiles()).map(_.mkString(",")).getOrElse(""))
    // and a retry builds cleanly
    val dir = Artifacts.parquet(s, "spec", key)(s.range(1).toDF("id"))
    assert(dir.count() === 1)
  }

  test("files artifact publishes when counts agree and the scan " +
      "reads the bytes back") {
    val root = freshRoot()
    val s = sessionWithRoot(root)
    val dir = Artifacts.files(s, "spec", "good") { tmp =>
      val base = tmp.toUri.getPath
      (0 until 4).foreach { i =>
        val fos = new java.io.FileOutputStream(
          new java.io.File(base, s"$i.bin"))
        try fos.write(s"payload$i".getBytes("UTF-8")) finally fos.close()
      }
      4L
    }
    val rows = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir)
    assert(rows.count() === 4)
  }

  test("deleteIf prunes under the default root, never under a " +
      "shared root") {
    val s = TestSpark.spark
    val key = s"prune_${System.nanoTime()}"
    Artifacts.parquet(s, "spec", key)(s.range(2).toDF("id")).count()
    assert(Artifacts.deleteIf(s, "spec", key)(true))
    // pruned: the next call rebuilds
    val before = Artifacts.buildsPerformed.get()
    Artifacts.parquet(s, "spec", key)(s.range(2).toDF("id")).count()
    assert(Artifacts.buildsPerformed.get() === before + 1)
    // condition=false never deletes
    assert(!Artifacts.deleteIf(s, "spec", key)(false))
    // shared root: refuse regardless of condition
    val sh = sessionWithRoot(freshRoot())
    Artifacts.parquet(sh, "spec", "keep")(sh.range(1).toDF("id")).count()
    assert(!Artifacts.deleteIf(sh, "spec", "keep")(true))
    assert(Artifacts.parquet(sh, "spec", "keep")(
      sys.error("must not rebuild")).count() === 1)
  }

  test("racing builders of the same key serialize to exactly one build") {
    val root = freshRoot()
    val s = sessionWithRoot(root)
    val before = Artifacts.buildsPerformed.get()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try {
          val n = Artifacts.parquet(s, "spec", "race")(
            s.range(100).toDF("id")).count()
          assert(n === 100)
        } catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, errs)
    assert(Artifacts.buildsPerformed.get() === before + 1)
    // and the published dir is the only thing on disk — losers left no
    // temp siblings
    assert(new java.io.File(root, "spec").listFiles()
      .map(_.getName).toSet === Set("race"))
  }

  test("a scheme-qualified root (file://) resolves through Hadoop FS " +
      "— the same branch an hdfs:// root takes") {
    val bare = freshRoot()
    val s = sessionWithRoot(s"file://$bare")
    val d = Artifacts.parquet(s, "spec", "schemed")(s.range(9).toDF("id"))
    assert(d.count() === 9)
    // published on the local disk behind the scheme, marker included
    assert(new java.io.File(bare, "spec/schemed/_SUCCESS").isFile)
    // reuse across a second session with the same schemed root
    val before = Artifacts.buildsPerformed.get()
    val s2 = sessionWithRoot(s"file://$bare")
    assert(Artifacts.parquet(s2, "spec", "schemed")(
      sys.error("must not rebuild")).count() === 9)
    assert(Artifacts.buildsPerformed.get() === before)
  }

  test("scratch dirs root under the configured shared root") {
    val root = freshRoot()
    val s = sessionWithRoot(root)
    val p = Artifacts.scratch(s, "probe")
    assert(p.startsWith(root), p)
  }

  test("Snapshot fingerprints scheme-qualified paths through Hadoop " +
      "FS, matching the local fast path byte for byte") {
    val d = TestSpark.sf
    val bare = graft.ops.Snapshot.of(Seq(s"$d/documents.parquet"))
    val viaFs = graft.ops.Snapshot.of(Seq(s"file://$d/documents.parquet"))
    assert(bare === viaFs)
    // and a rewrite-sensitive property survives the FS branch: a
    // different table fingerprints differently
    val other = graft.ops.Snapshot.of(Seq(s"file://$d/orders.parquet"))
    assert(other !== viaFs)
  }

  test("tradeGraph and the dedup cluster pipeline build under the " +
      "configured shared root") {
    val root = freshRoot()
    val s = sessionWithRoot(root)
    assert(graft.ops.Graph.tradeGraph(s, TestSpark.sf).count() > 0)
    assert(new java.io.File(root, "graph").listFiles()
      .exists(d => new java.io.File(d, "_SUCCESS").isFile))
    // a second shared-root session reuses the published edge table
    val before = Artifacts.buildsPerformed.get()
    val s2 = sessionWithRoot(root)
    assert(graft.ops.Graph.tradeGraph(s2, TestSpark.sf).count() > 0)
    assert(Artifacts.buildsPerformed.get() === before)
    // the dedup cluster pipeline (shingle index + cluster table) roots
    // at the same conf — the 100×-deployment path the round-11 review
    // flagged
    assert(SparkEntry.queries("llm_dedup_clusters")(s, TestSpark.sf)
      .count() > 0)
    for (fam <- Seq("clusters", "shidx"))
      assert(new java.io.File(root, fam).listFiles()
        .exists(d => new java.io.File(d, "_SUCCESS").isFile), fam)
    graft.ops.OpCache.release(s)
    s.catalog.clearCache()
  }
}
