package graft

import org.apache.spark.sql.SparkSession

/** Interleaved median-of-N A/B for `graph_connected_components`'
  * algorithm choice (round-14 verdict item 4): the min-hook + 3-jump
  * contraction loop (`spark.graft.ccAlgo=hook`, the incumbent) vs
  * Kiveris et al. alternating large-star/small-star contraction
  * (`ccAlgo=star`). The hook loop's ×10→×30 ScaleRehearsal segment
  * ran super-linear (4.3× time on 3× edges, round-13 watch item), so
  * this main measures both on the REAL sf0.1 corpus and on the ×10
  * and ×30 synthetic trade fixtures, interleaving variants run-by-run
  * so session drift (page cache, JIT, GC) lands on both equally —
  * the same protocol that settled the LPA checkpoint (`graft.LpaAb`).
  *
  * ComponentsSpec proves the two algorithms label identically
  * (including the real trade graph); this main only decides SPEED.
  * The shared edge artifact builds once per dir before any timing.
  *
  * Usage: runMain graft.CcAb [runsPerVariant] [mult ...]
  * (defaults: 5 runs; dirs = sf0.1, x10, x30)
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(5)
    val mults =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaleRoot =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val dirs = ("sf0.1", sf01) +: mults.map { m =>
      val d = s"$scaleRoot/x$m"
      ScaleRehearsal.synthesizeTrade(spark, d, m)
      (s"x$m", d)
    }

    def one(dir: String, algo: String): (Double, Int) = {
      // "auto" exercises the default dispatcher (unset conf); the
      // reported round count identifies which algorithm it chose
      // (hook: 2-3 rounds on these fixtures, star: constant 4)
      if (algo == "auto") spark.conf.unset("spark.graft.ccAlgo")
      else spark.conf.set("spark.graft.ccAlgo", algo)
      try {
        graft.ops.LlmExtra.lastCcRounds = -1
        val t0 = System.nanoTime()
        SparkEntry.queries("graph_connected_components")(spark, dir)
          .write.mode("overwrite").format("noop").save()
        ((System.nanoTime() - t0) / 1e9, graft.ops.LlmExtra.lastCcRounds)
      } finally {
        spark.conf.unset("spark.graft.ccAlgo")
        graft.ops.OpCache.release(spark)
        spark.catalog.clearCache()
      }
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def fmt(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    val lines = dirs.map { case (tag, dir) =>
      // edge artifact builds outside every timing; one warm run per
      // variant lands codegen/JIT outside the samples
      val edges = graft.ops.Graph.tradeGraph(spark, dir).count()
      // SPARK_GRAFT_CC_ALGOS overrides the variant pair (e.g. "auto"
      // alone confirms what the dispatcher picks at a given scale)
      val algos = sys.env.get("SPARK_GRAFT_CC_ALGOS")
        .map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Seq("hook", "star"))
      algos.foreach(a => one(dir, a))
      // interleaved: a0-b0, a1-b1, … (one warm pass per variant above)
      val samples = (1 to runs).map(_ => algos.map(a => one(dir, a)))
      val perAlgo = algos.zipWithIndex.map { case (a, i) =>
        val xs = samples.map(_(i))
        s""""$a":[${xs.map(t => fmt(t._1)).mkString(",")}],""" +
          s""""${a}_median":${fmt(median(xs.map(_._1)))},""" +
          s""""${a}_rounds":${xs.map(_._2).max}"""
      }.mkString(",")
      val line = s"""{"cc_ab":{"dir":"$tag","edges":$edges,""" +
        s""""runs":$runs,$perAlgo}}"""
      println(line)
      line
    }
    try {
      val w = new java.io.PrintWriter("/tmp/graft_cc_ab.json")
      try lines.foreach(w.println) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
