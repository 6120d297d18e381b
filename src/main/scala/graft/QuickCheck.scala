package graft
import org.apache.spark.sql.SparkSession

/** Throwaway per-round dev runner: show the named keys' full output at
  * a given sf dir (Smoke prints counts only). Usage:
  * runMain graft.QuickCheck <sfDir> <key> [key...] */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"=== $k ===")
      val t0 = System.nanoTime()
      try SparkEntry.queries(k)(spark, sfDir).show(50, truncate = false)
      catch { case e: Throwable =>
        println(s"ERROR: ${e}"); e.printStackTrace() }
      println(f"  [${(System.nanoTime() - t0) / 1e9}%.2f s]")
      graft.ops.OpCache.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
