package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SnapshotTable

/** The STREAMING front door (round 18): `readStream.format("graft")`
  * tails the lake table's committed versions as a changelog;
  * `writeStream.format("graft")` merges micro-batches exactly-once via
  * the txn replay guard — both through the standard Spark surface. */
class StreamingDoorSpec extends AnyFunSuite {
  import TestSpark._

  private def withRoot(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("sdoor_spec")
      .toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  private def img(pairs: (Long, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  test("readStream.format(\"graft\") tails the table: initial snapshot " +
      "as inserts, then exactly each commit's row-level changes — " +
      "matching the library readChanges") {
    withRoot { root =>
      val ckpt = root + "_ckpt"
      SnapshotTable.commitWithStats(spark, root, "k", retain = 8)(_ =>
        img(1L -> "v1", 2L -> "v2"))
      val v1 = SnapshotTable.latestVersion(spark, root).get
      SnapshotTable.commitMergeDV(spark, root,
        img(2L -> "B2", 3L -> "v3"), "k", retain = 8)((_, b) => b)

      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Long, String)]()
      def drain(): Set[(String, Long, String)] = {
        val out = scala.collection.mutable.Set.empty[
          (String, Long, String)]
        var x = buf.poll()
        while (x != null) { out += x; x = buf.poll() }
        out.toSet
      }
      def runTail(): Unit = {
        val q = spark.readStream.format("graft")
          .option("changeKey", "k")
          .option("startingVersion", v1.toString).load(root)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch {
            (df: org.apache.spark.sql.DataFrame, _: Long) =>
              df.select("_change_type", "k", "v").collect().foreach(r =>
                buf.add((r.getString(0), r.getLong(1), r.getString(2))))
              ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      runTail()
      assert(drain() === Set(
        ("insert", 1L, "v1"), ("insert", 2L, "v2"),
        ("update_preimage", 2L, "v2"), ("update_postimage", 2L, "B2"),
        ("insert", 3L, "v3")))

      // RESTART from the checkpoint after another commit: only the new
      // span's changes arrive (no snapshot replay)
      SnapshotTable.commitMergeDV(spark, root, img(1L -> "C1"), "k",
        retain = 8)((_, b) => b)
      runTail()
      assert(drain() === Set(
        ("update_preimage", 1L, "v1"), ("update_postimage", 1L, "C1")))
    }
  }

  test("a RESTORE mid-stream reaches tailing consumers as the " +
      "rollback's row-level diff — the un-apply of the bad commit") {
    withRoot { root =>
      val ckpt = root + "_ckpt"
      SnapshotTable.commitWithStats(spark, root, "k", retain = 8)(_ =>
        img(1L -> "v1", 2L -> "v2"))
      val vGood = SnapshotTable.latestVersion(spark, root).get
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Long, String)]()
      def runTail(): Unit = {
        val q = spark.readStream.format("graft")
          .option("changeKey", "k").load(root)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch {
            (df: org.apache.spark.sql.DataFrame, _: Long) =>
              df.select("_change_type", "k", "v").collect().foreach(r =>
                buf.add((r.getString(0), r.getLong(1), r.getString(2))))
              ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      runTail(); buf.clear() // consume the bootstrap
      // the BAD commit lands and is consumed downstream...
      SnapshotTable.commitMergeDV(spark, root, img(2L -> "POISON"), "k",
        retain = 8)((_, b) => b)
      runTail()
      val poisoned = {
        val out = scala.collection.mutable.Set.empty[
          (String, Long, String)]
        var x = buf.poll()
        while (x != null) { out += x; x = buf.poll() }
        out.toSet
      }
      assert(poisoned === Set(("update_preimage", 2L, "v2"),
        ("update_postimage", 2L, "POISON")))
      // ...then the rollback: consumers see the EXACT un-apply, so a
      // downstream retract-fold heals without re-bootstrapping
      SnapshotTable.restore(spark, root, vGood, retain = 8)
      runTail()
      val healed = {
        val out = scala.collection.mutable.Set.empty[
          (String, Long, String)]
        var x = buf.poll()
        while (x != null) { out += x; x = buf.poll() }
        out.toSet
      }
      assert(healed === Set(("update_preimage", 2L, "POISON"),
        ("update_postimage", 2L, "v2")))
    }
  }

  test("maxVersionsPerTrigger throttles a version backlog into capped " +
      "micro-batches — across a restart too — and the retract fold is " +
      "identical to the unthrottled drain (round-19 verdict item 4)") {
    withRoot { root =>
      val ckpt = root + "_ckpt"
      SnapshotTable.commitWithStats(spark, root, "k", retain = 20)(_ =>
        img(1L -> "v1", 2L -> "v2"))
      val v1 = SnapshotTable.latestVersion(spark, root).get
      // a 9-version backlog accumulates while no consumer runs
      (1 to 9).foreach(i => SnapshotTable.commitAppend(spark, root,
        img((100L + i) -> s"w$i"), retain = 20))

      val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[
        Int]()
      val rows = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Long, String)]()
      def runTail(cap: Int): Unit = {
        val q = spark.readStream.format("graft")
          .option("changeKey", "k")
          .option("startingVersion", v1.toString)
          .option("maxVersionsPerTrigger", cap.toString).load(root)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch {
            (df: org.apache.spark.sql.DataFrame, _: Long) =>
              val got = df.select("_change_type", "k", "v").collect()
              batchSizes.add(got.length)
              got.foreach(r => rows.add(
                (r.getString(0), r.getLong(1), r.getString(2))))
              ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      runTail(cap = 3)
      // 9 versions at <=3/trigger: at least ceil(9/3)=3 spans (the
      // bootstrap span is capped too), never one giant batch
      val nonEmpty1 = batchSizes.size()
      assert(nonEmpty1 >= 3,
        s"backlog must drain in capped spans, got $nonEmpty1 batches " +
          s"of sizes ${batchSizes.toArray.mkString(",")}")
      // the fold equals the table image regardless of the batching
      def fold(): Set[(Long, String)] = {
        val all = rows.toArray(Array.empty[(String, Long, String)])
        val pos = all.filter(t => t._1 == "insert" ||
          t._1 == "update_postimage").map(t => (t._2, t._3))
        val neg = all.filter(t => t._1 == "delete" ||
          t._1 == "update_preimage").map(t => (t._2, t._3))
        // bag difference (no duplicate deliveries expected)
        val negBag = scala.collection.mutable.Map.empty[(Long, String),
          Int].withDefaultValue(0)
        neg.foreach(t => negBag(t) += 1)
        pos.flatMap { t =>
          if (negBag(t) > 0) { negBag(t) -= 1; None } else Some(t)
        }.toSet
      }
      val expected = SnapshotTable.read(spark, root).get
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(fold() === expected)

      // RESTART with more backlog: the persisted throttle position
      // seeds the restarted source — capped spans continue, no span is
      // re-delivered (the fold stays exact), no regression batch
      batchSizes.clear()
      (10 to 15).foreach(i => SnapshotTable.commitAppend(spark, root,
        img((100L + i) -> s"w$i"), retain = 20))
      runTail(cap = 2)
      assert(batchSizes.size() >= 3,
        s"post-restart backlog must stay capped, got " +
          s"${batchSizes.toArray.mkString(",")}")
      val expected2 = SnapshotTable.read(spark, root).get
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(fold() === expected2,
        "restart must not re-deliver or skip any span")
    }
  }

  test("the table_stream_door contract key is re-run-safe: the fold " +
      "publishes atomically, warm re-invocation reads without " +
      "re-streaming, and CONCURRENT invocations (the r18/r19 bench " +
      "flake shape: a second process entering mid-stream) all land " +
      "the same fold with no read error") {
    def run() = TestSpark.q("table_stream_door").collect()
    val first = run()
    assert(first.length === 1 && !first.head.isNullAt(0))
    // warm re-invocation: the _SUCCESS-gated folded artifact serves —
    // no second stream, no second build (materialize-once)
    val builds0 = graft.ops.Artifacts.buildsPerformed.get()
    val second = run()
    assert(second.map(_.toString).toSeq === first.map(_.toString).toSeq)
    assert(graft.ops.Artifacts.buildsPerformed.get() === builds0,
      "warm re-invocation must read the folded artifact, not rebuild")
    // concurrent cold invocations: wipe the published fold, then race
    // three invocations. The old design's shared checkpoint/batches
    // pair made this interleaving surface PATH_NOT_FOUND; with the
    // per-attempt private work dir + atomic publish, every racer must
    // return the same single-row fold.
    val dir = new org.apache.hadoop.fs.Path(
      graft.ops.Artifacts.root(spark) + "/stream_door_fold")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(dir, true), "precondition: published fold existed")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = (1 to 3).map(_ => Future(run()))
    val results = racers.map(Await.result(_, 10.minutes))
    results.foreach(r => assert(r.map(_.toString).toSeq
      === first.map(_.toString).toSeq,
      "every concurrent invocation must land the identical fold"))
  }

  test("writeStream.format(\"graft\") merges micro-batches into the " +
      "lake table exactly-once: keyed replace, DV merge commits, and " +
      "a replayed batch id is skipped") {
    withRoot { root =>
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val ckpt = root + "_ckpt"
      // seed so the sink's merges have a base with stats
      SnapshotTable.commitWithStats(spark, root, "k", retain = 8)(_ =>
        img(1L -> "seed1", 2L -> "seed2"))
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("k", "v")
        .writeStream.format("graft")
        .option("mergeKey", "k").option("appId", "door-test")
        .option("retain", "8")
        .option("checkpointLocation", ckpt).start(root)
      try {
        input.addData((2L, "b0"), (10L, "b0x"))
        q.processAllAvailable()
        input.addData((10L, "b1"))
        q.processAllAvailable()
      } finally q.stop()
      val cur = SnapshotTable.read(spark, root).get
      assert(cur.count() === 3)
      assert(cur.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
        === Seq((1L, "seed1"), (2L, "b0"), (10L, "b1")))
      // merge-on-read: the sink's commits carried the base files (no
      // rewrite) — v1's files are a subset of the latest's
      val vs = SnapshotTable.committedVersions(spark, root)
      assert(SnapshotTable.dataFiles(spark, root, vs.head).toSet
        .subsetOf(SnapshotTable.dataFiles(spark, root, vs.last).toSet),
        "sink must merge-on-read by default")
      // REPLAY: re-delivering an absorbed batch id must be a no-op
      val vBefore = SnapshotTable.latestVersion(spark, root).get
      new graft.dsv2.GraftStreamSink(root, "k", "door-test",
        retain = 8, mor = true)
        .addBatch(0L, img(2L -> "ZOMBIE"))
      assert(SnapshotTable.latestVersion(spark, root).get === vBefore,
        "replayed batch must not commit")
      assert(SnapshotTable.read(spark, root).get
        .where(col("k") === 2L).first().getString(1) === "b0")
    }
  }
}
