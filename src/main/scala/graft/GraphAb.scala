package graft

import org.apache.spark.sql.SparkSession

/** Interleaved median A/B for the round-20 graph-loop state-side
  * broadcast (`spark.graft.graphStateBroadcast` on vs off): pagerank,
  * BFS, and LPA timed alternately under each setting so session drift
  * (page cache, JIT, GC) lands on both variants equally — the LpaAb
  * discipline. Results identical by construction (order-independent
  * per-round aggregates); this main decides the `auto` default's
  * worth and leaves the BENCH_LOG evidence.
  *
  * Usage: runMain graft.GraphAb [runsPerVariant]   (default 5)
  */
object GraphAb {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // shared edge artifact builds once, outside every timing
    graft.ops.Graph.tradeGraph(spark, sf)

    def sample(key: String, mode: String): Double = {
      spark.conf.set("spark.graft.graphStateBroadcast", mode)
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.OpCache.release(spark)
      spark.catalog.clearCache()
      dt
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    def fmt(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    Seq("graph_pagerank", "graph_shortest_path",
      "graph_label_propagation").foreach { key =>
      sample(key, "off") // untimed warmup: codegen + artifact first-touch
      val (as, bs) = (1 to runs).map { _ =>
        (sample(key, "off"), sample(key, "on"))
      }.unzip
      println(s"GRAPHAB $key off=[${as.map(fmt).mkString(",")}] " +
        s"median=${fmt(median(as))} " +
        s"on=[${bs.map(fmt).mkString(",")}] median=${fmt(median(bs))}")
    }
    spark.stop()
  }
}
