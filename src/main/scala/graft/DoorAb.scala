package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B rehearsal for the round-19 native DSv2 batch read (verdict
  * item 2): full-scan aggregate over the same snapshot table through
  * (a) the library read, (b) the front door's native Batch, (c) the
  * bare round-18 `V1Scan` relation (the InternalRow→Row→InternalRow
  * seam), and (d) the full round-18 door (ScanBuilder negotiation +
  * the V1 relation) — all measured on the SAME table in the SAME
  * session, INTERLEAVED so box drift and page-cache warming hit every
  * arm equally.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DoorAb"
  */
object DoorAb {
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

    // 1000× replicated events (~100M rows at sf0.1): the per-ROW cost
    // must dominate the per-QUERY driver overhead — the regime a
    // 100 TB scan lives in — or the seam tax hides in planning noise
    val root = ops.Artifacts.scratch(spark, "door_ab1k_" +
      new java.io.File(sf).getName) + "/t"
    if (graft.streaming.SnapshotTable.latestVersion(spark, root).isEmpty) {
      val ev = ops.Tables.events(spark, sf)
        .crossJoin(spark.range(0, 1000).toDF("rep"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          ops.Tables.ep(col("ts")).as("ts_us"),
          round(col("value"), 2).as("value"), col("rep"))
      graft.streaming.SnapshotTable.commitWithStats(spark, root,
        "user_id", retain = 2)(_ => ev.repartition(32))
      ()
    }
    val v = graft.streaming.SnapshotTable.latestVersion(spark, root).get
    val files = graft.streaming.SnapshotTable.dataFiles(spark, root, v)
    val schema = graft.streaming.SnapshotTable
      .schemaOfVersion(spark, root, v)
    println("DOOR_AB rows=" + graft.streaming.SnapshotTable
      .readVersion(spark, root, v).count() + s" files=${files.size}")

    val arms: Seq[(String, () => DataFrame)] = Seq(
      ("library", () =>
        graft.streaming.SnapshotTable.readVersion(spark, root, v)),
      ("door_native", () => spark.read.format("graft").load(root)),
      // the bare round-18 relation: every row pays the Row seam
      ("v1_seam", () =>
        spark.baseRelationToDataFrame(new graft.dsv2.GraftV1Relation(
          spark.sqlContext, root, v, schema, files))),
      // the full round-18 door: ScanBuilder negotiation (manifest
      // pruning + stats, identical to the native door's) + the seam
      ("v1_door", () => {
        val b = new graft.dsv2.GraftScanBuilder(root, v, schema)
        b.pushFilters(Array.empty)
        b.build()
        spark.baseRelationToDataFrame(new graft.dsv2.GraftV1Relation(
          spark.sqlContext, root, v, schema, files))
      }))

    def once(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val r = fn().agg(count(lit(1)), sum("value"), sum("user_id"),
        min("ts_us"), max("event_id")).collect()
      require(r.nonEmpty)
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, fn) => once(fn) } // warm every arm
    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      arms.foreach { case (l, fn) => samples(l) = once(fn) :: samples(l) }
    }
    arms.foreach { case (l, _) =>
      val ts = samples(l).sorted
      println(f"DOOR_AB $l%-12s min=${ts.head}%.3f s " +
        f"median=${ts(2)}%.3f max=${ts.last}%.3f")
    }
    spark.stop()
  }
}
