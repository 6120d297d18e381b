package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale rehearsal for the round-15 snapshot-table write paths: does a
  * FIXED-SIZE append (and a localized merge) stay flat-cost while the
  * TABLE grows ×1 → ×10 → ×30, where the pre-round-15 rewrite design
  * grew linearly with the table? The same protocol that settled the
  * bloom-join and CC questions: synthetic fixtures sized by a
  * multiplier, medians over repeated runs, and an explicit CONTROL —
  * the full-rewrite commit (`commit` with unionByName, exactly the
  * old write path) timed beside the manifest append on identical
  * inputs, so the claimed win is a measured ratio, not an asymptotic
  * argument.
  *
  * Per multiplier m:
  *   base table  = m × 2M rows (key long + three hash-valued payload
  *                 columns), key-clustered into m × 8 files with
  *                 stats on key
  *   append      = 1M fresh rows (keys past the base range), 4 files —
  *                 commitAppend, median of `runs`
  *   merge       = 50k-row batch confined to ONE file's key range —
  *                 commitMerge (upsert resolve), median of `runs`
  *   control     = the same 1M-row delta committed by FULL REWRITE
  *                 (commit(state ∪ delta)), median of `runs`
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "runMain graft.TableScale [runs] [mult ...]"
  * (defaults: 3 runs; mults 1, 10, 30) */
object TableScale {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val mults =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 10, 30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.streaming.SnapshotTable

    val scaleRoot =
      sys.env.getOrElse("SPARK_GRAFT_TABLE_DIR", "/tmp/graft_tablescale")
    // hash-valued payload columns: sequential longs parquet-encode to
    // almost nothing (RLE/delta), which would let the full-rewrite
    // CONTROL dodge the IO it is supposed to demonstrate — xxhash64
    // payloads make every row cost real bytes while `key` stays
    // clustered for the stats manifest
    def rows(from: Long, n: Long, parts: Int): DataFrame =
      spark.range(from, from + n, 1L, parts)
        .select(col("id").as("key"),
          pmod(xxhash64(col("id")), lit(86400000000L)).as("ts"),
          (pmod(xxhash64(col("id"), lit(7)), lit(1000000L)) / 1000.0)
            .as("value"),
          concat(lit("payload-"), xxhash64(col("id"), lit(13)))
            .as("tag"))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def fmt(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    val baseRows = 2000000L
    val deltaRows = 1000000L
    val lines = mults.map { m =>
      val root = s"$scaleRoot/x$m"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val n = baseRows * m
      // untimed inter-run hygiene: the refcount sweep is age-gated
      // (15 min — an in-flight-commit protection irrelevant to a
      // single-writer rehearsal), so without a force-sweep every
      // full-rewrite control run would LEAVE a whole table copy on
      // disk and the session would measure page-cache writeback
      // pressure instead of commit cost
      def forceSweep(): Unit = {
        val latest = SnapshotTable.latestVersion(spark, root).get
        val referenced = SnapshotTable.dataFiles(spark, root, latest)
          .map(_.takeWhile(_ != '/')).toSet
        fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("seg-") &&
            !referenced.contains(st.getPath.getName))
          .foreach(st => fs.delete(st.getPath, true))
      }
      val buildSec = timed {
        SnapshotTable.commitWithStats(spark, root, "key", retain = 1)(
          _ => SnapshotTable.clusterBy(rows(0L, n, 8 * m), "key", 8 * m))
      }
      // warm one append (codegen/JIT), then the timed medians; fresh
      // key ranges per run so every append is a genuine delta
      var next = n
      def delta(parts: Int, count: Long): DataFrame = {
        val d = rows(next, count, parts); next += count; d
      }
      // bytes a commit PHYSICALLY WROTE — the noise-free witness:
      // wall-clock on a page-cache-buffered local disk measures CPU
      // encode + erratic writeback stalls, while written bytes are
      // deterministic and exactly the quantity that scales (or
      // doesn't) with the table. Measured as a before/after file-set
      // diff (newFiles() can't serve here: retain=1 vacuums the
      // previous version before it could diff against it)
      def filesNow(): Set[String] =
        SnapshotTable.latestVersion(spark, root).toSeq.flatMap(v =>
          SnapshotTable.dataFiles(spark, root, v)).toSet
      def wroteSince(before: Set[String]): Long =
        (filesNow() -- before).toSeq.map(f =>
          fs.getFileStatus(new org.apache.hadoop.fs.Path(
            s"$root/$f")).getLen).sum
      SnapshotTable.commitAppend(spark, root, delta(4, deltaRows),
        retain = 1)
      forceSweep()
      val appendSec = (1 to runs).map { _ =>
        val pre = filesNow()
        val t = timed {
          SnapshotTable.commitAppend(spark, root, delta(4, deltaRows),
            retain = 1)
        }
        val b = wroteSince(pre); forceSweep(); (t, b)
      }
      // localized merge: 50k keys inside the FIRST clustered file's
      // range — production's "today's segment" upsert
      val mergeSec = (1 to runs).map { _ =>
        val pre = filesNow()
        val t = timed {
          SnapshotTable.commitMerge(spark, root,
            rows(0L, 50000L, 2).withColumn("value", lit(-1.0)), "key",
            retain = 1)((ex, b) =>
            ex.fold(b)(e => e.unionByName(b).groupBy("key")
              .agg(max("ts").as("ts"), min("value").as("value"),
                max("tag").as("tag"))))
        }
        val b = wroteSince(pre); forceSweep(); (t, b)
      }
      // CONTROL — the pre-round-15 write path: every version rewrites
      // the full image (state ∪ delta). Same delta size as the append.
      val controlSec = (1 to runs).map { _ =>
        val pre = filesNow()
        val t = timed {
          SnapshotTable.commit(spark, root, retain = 1)(st =>
            st.get.unionByName(delta(4, deltaRows)))
        }
        val b = wroteSince(pre); forceSweep(); (t, b)
      }
      val controlBytes = controlSec.map(_._2).max
      val appendBytes = appendSec.map(_._2).max
      val mergeBytes = mergeSec.map(_._2).max
      val line = s"""{"table_scale":{"mult":$m,"base_rows":$n,""" +
        s""""build_sec":${fmt(buildSec)},""" +
        s""""append":[${appendSec.map(x => fmt(x._1)).mkString(",")}],""" +
        s""""append_median":${fmt(median(appendSec.map(_._1)))},""" +
        s""""append_mb":${appendBytes / 1000000L},""" +
        s""""merge":[${mergeSec.map(x => fmt(x._1)).mkString(",")}],""" +
        s""""merge_median":${fmt(median(mergeSec.map(_._1)))},""" +
        s""""merge_mb":${mergeBytes / 1000000L},""" +
        s""""rewrite_control":[${controlSec.map(x => fmt(x._1))
          .mkString(",")}],""" +
        s""""rewrite_median":${fmt(median(controlSec.map(_._1)))},""" +
        s""""rewrite_mb":${controlBytes / 1000000L}}}"""
      println(line)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      line
    }
    try {
      val w = new java.io.PrintWriter("/tmp/graft_table_scale.json")
      try lines.foreach(w.println) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
