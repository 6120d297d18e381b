package graft

import org.apache.spark.sql.SparkSession

/** Round-21 interleaved conf A/B over the whole inventory: each key
  * runs once under conf A and once under conf B back-to-back, with the
  * order alternating per key (even index A→B, odd B→A) so warm-plan
  * bias and box drift land on both variants equally. Confs must be
  * runtime-settable SQL confs (AQE, coalescing, split sizing). Prints
  * per-key lines and paired totals + win counts.
  *
  * Usage: runMain graft.FloorAb <confA k=v[,k=v...]|-> <confB ...> [keyRegex]
  *   '-' means session defaults (the bench's own settings).
  */
object FloorAb {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FloorAb <confA> <confB> [keyRegex]")
    def parse(s: String): Seq[(String, String)] =
      if (s == "-") Nil
      else s.split(",").toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val (confA, confB) = (parse(args(0)), parse(args(1)))
    val pat = args.lift(2).getOrElse(".*").r
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // defaults to restore between variants
    val allKeys = (confA ++ confB).map(_._1).distinct
    val defaults = allKeys.map(k => k -> spark.conf.getOption(k)).toMap
    def setConf(c: Seq[(String, String)]): Unit = {
      allKeys.foreach(k => defaults(k) match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      })
      c.foreach { case (k, v) => spark.conf.set(k, v) }
    }
    graft.ops.Scans.tableArtifactBuild(spark, sf, includeGraph = true,
      includeLlm = true, includeBucketed = true, includeJdbc = true)
    Seq("scan_projected", "agg_distinct_count", "scan_parquet",
      "source_kafka_shape", "llm_token_bpe")
      .foreach(k => SparkEntry.queries.get(k).foreach(f =>
        f(spark, sf).count()))

    def runOnce(key: String): Double = {
      val fn = SparkEntry.queries(key)
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sf)
        try df.write.mode("overwrite").format("noop").save()
        catch { case _: org.apache.spark.sql.AnalysisException =>
          df.count(); () }
      } catch { case e: Throwable =>
        println(s"FLOORAB $key FAILED ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.OpCache.release(spark)
      spark.catalog.clearCache()
      dt
    }
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    var (ta, tb) = (0.0, 0.0)
    var (winsA, winsB) = (0, 0)
    val keys = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => pat.findFirstIn(k).isDefined)
    keys.zipWithIndex.foreach { case (k, i) =>
      val (x, y) = if (i % 2 == 0) {
        setConf(confA); val a = runOnce(k)
        setConf(confB); val b = runOnce(k); (a, b)
      } else {
        setConf(confB); val b = runOnce(k)
        setConf(confA); val a = runOnce(k); (a, b)
      }
      ta += x; tb += y
      if (x < y) winsA += 1 else if (y < x) winsB += 1
      println(s"FLOORAB $k a=${fmt(x)} b=${fmt(y)}")
    }
    println(s"FLOORABTOTAL keys=${keys.size} a=${fmt(ta)} b=${fmt(tb)} " +
      s"winsA=$winsA winsB=$winsB")
    spark.stop()
  }
}
