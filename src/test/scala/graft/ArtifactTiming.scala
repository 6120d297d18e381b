package graft

/** Scratch instrumentation: time each table-artifact root builder on a
  * WARM store to find where the per-session cost lives. */
object ArtifactTiming {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // call the composite twice: first pays session first-touch, the
    // second is the steady warm cost
    timed("tableArtifactBuild#1")(graft.ops.Scans.tableArtifactBuild(spark, d))
    timed("tableArtifactBuild#2")(graft.ops.Scans.tableArtifactBuild(spark, d))
  }
}
