package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-clone strategy A/B at the ~100M-row regime (round 20; DoorAb
  * conventions — interleaved arms, median-of-samples, a table big
  * enough that per-row cost dominates planning constants): the
  * byte-copy clone ([[graft.streaming.SnapshotTable.cloneTo]] — one
  * distributed FileUtil copy per kept segment file, stats manifest
  * carried verbatim) against the naive alternative a user would
  * otherwise run, `readVersion → commitWithStats` (full parquet
  * decode + shuffle-free re-encode + a fresh stats pass). Byte copy
  * is the Delta DEEP CLONE shape: at 100 TB the difference is a pure
  * parallel I/O pass vs a full decode/encode of every column plus
  * re-deriving the pruning metadata the source already holds.
  * Each sample clones into a fresh target and deletes it after
  * timing, so disk stays bounded and no sample reads a warm target. */
object CloneScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")

    // the DoorAb 1000x-replicated events table (shared content-keyed
    // root: a prior DoorAb session's build is reused as-is)
    val root = ops.Artifacts.scratch(spark, "door_ab1k_" +
      new java.io.File(sf).getName) + "/t"
    val st = graft.streaming.SnapshotTable
    if (st.latestVersion(spark, root).isEmpty) {
      val ev = ops.Tables.events(spark, sf)
        .crossJoin(spark.range(0, 1000).toDF("rep"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          ops.Tables.ep(col("ts")).as("ts_us"),
          round(col("value"), 2).as("value"), col("rep"))
      st.commitWithStats(spark, root, "user_id", retain = 2)(_ =>
        ev.repartition(32))
      ()
    }
    val v = st.latestVersion(spark, root).get
    val rows = st.readVersion(spark, root, v).count()
    val bytes = st.dataFiles(spark, root, v).map { f =>
      new java.io.File(new java.net.URI(s"$root/$f").getPath).length
    }.sum
    println(s"CLONE_SCALE rows=$rows files=" +
      st.dataFiles(spark, root, v).size +
      f" bytes=${bytes / 1e9}%.2f GB")

    val scratch = ops.Artifacts.scratch(spark, "clone_scale_tgts")
    var n = 0
    def freshTarget(): String = { n += 1; s"$scratch/t$n" }
    def rm(p: String): Unit = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(path, true); ()
    }

    val arms: Seq[(String, String => Unit)] = Seq(
      ("byte_copy", (tgt: String) => {
        st.cloneTo(spark, root, tgt); () }),
      ("re_encode", (tgt: String) => {
        st.commitWithStats(spark, tgt, "user_id", retain = 2,
          expectedBase = st.EmptyBase)(_ =>
          st.readVersion(spark, root, v))
        () }))

    def once(fn: String => Unit): Double = {
      val tgt = freshTarget()
      val t0 = System.nanoTime()
      fn(tgt)
      val dt = (System.nanoTime() - t0) / 1e9
      // correctness guard outside the timed window
      require(st.readVersion(spark, tgt,
        st.latestVersion(spark, tgt).get).count() == rows,
        s"clone at $tgt lost rows")
      rm(tgt)
      dt
    }
    arms.foreach { case (_, fn) => once(fn) } // warm both arms
    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    (1 to 3).foreach { _ =>
      arms.foreach { case (l, fn) => samples(l) = once(fn) :: samples(l) }
    }
    arms.foreach { case (l, _) =>
      val ts = samples(l).sorted
      println(f"CLONE_SCALE $l%-10s min=${ts.head}%.3f s " +
        f"median=${ts(1)}%.3f max=${ts.last}%.3f")
    }
    spark.stop()
  }
}
