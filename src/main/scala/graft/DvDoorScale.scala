package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the round-20 distributed deletion-vector door
  * path: a table whose DV entry count EXCEEDS the broadcast cap, read
  * through `format("graft")` under both regimes with interleaved arms
  * (the DoorAb lesson — sequential arms drift ~2× on page-cache
  * warming):
  *
  *   broadcast   — cap raised above the entry count: the r19 path,
  *                 driver collects + broadcasts the tombstone set
  *   distributed — cap below the entry count: per-file shards staged
  *                 once (distributed partitionBy(md5(file)) job),
  *                 masked readers drain their own shard executor-side
  *
  * Reports the one-time shard staging cost separately from the warm
  * per-query read, and asserts the two regimes serve identical
  * aggregates. Run: `sbt "runMain graft.DvDoorScale [rows] [dvKeys]"`.
  */
object DvDoorScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val dvKeys = args.lift(1).map(_.toLong).getOrElse(6000000L)
    val spark = SparkSession.builder()
      .appName("graft-dv-door-scale")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.log.level", "WARN")
      .getOrCreate()
    import graft.streaming.SnapshotTable
    val root = java.nio.file.Files
      .createTempDirectory("dv_door_scale").toString + "/t"

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println(s"build: rows=$rows dvKeys=$dvKeys")
    val (_, tBuild) = timed {
      SnapshotTable.commitWithStats(spark, root, "k", retain = 2)(_ =>
        spark.range(rows).select(col("id").as("k"),
            (col("id") % 1000).cast("double").as("v"))
          .repartitionByRange(16, col("k")))
      // one merge-on-read upsert touching dvKeys rows spread over the
      // whole key space — every base file ends up masked
      SnapshotTable.commitMergeDV(spark, root,
        spark.range(dvKeys).select(
          (col("id") * (rows / dvKeys)).as("k"),
          lit(-1.0).as("v")), "k", retain = 2)((_, b) => b)
      ()
    }
    println(f"build done in $tBuild%.1f s")

    val capKey = "spark.graft.dsv2.maxDvBroadcastEntries"
    def runArm(cap: String): (Long, Double, Double) = {
      spark.conf.set(capKey, cap)
      val (n, tCount) = timed(
        spark.read.format("graft").load(root).count())
      val (s1, tAgg) = timed(
        spark.read.format("graft").load(root)
          .agg(sum("v")).collect().head.getDouble(0))
      val _ = s1
      (n, tCount, tAgg)
    }

    // cold pass per regime first (distributed pays its one-time shard
    // staging here), then interleaved warm passes
    val (_, tStage) = timed(runArm("1000"))
    println(f"distributed cold (incl. shard staging): $tStage%.1f s")
    val (_, tBcastCold) = timed(runArm((dvKeys * 2).toString))
    println(f"broadcast cold: $tBcastCold%.1f s")

    val arms = scala.collection.mutable.Map(
      "broadcast" -> List.empty[Double],
      "distributed" -> List.empty[Double])
    var nB = 0L; var nD = 0L
    (1 to 3).foreach { _ =>
      val (nb, tb1, tb2) = runArm((dvKeys * 2).toString)
      arms("broadcast") = arms("broadcast") :+ (tb1 + tb2); nB = nb
      val (nd, td1, td2) = runArm("1000")
      arms("distributed") = arms("distributed") :+ (td1 + td2); nD = nd
    }
    require(nB == nD && nB == rows,
      s"regimes disagree: broadcast=$nB distributed=$nD expected=$rows")
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"rows=$rows dvKeys=$dvKeys files=16 " +
      f"broadcast_med=${med(arms("broadcast"))}%.2f s " +
      f"distributed_med=${med(arms("distributed"))}%.2f s " +
      f"(count+sum per arm, 3 interleaved passes)")
    spark.stop()
  }
}
