package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT, codegen compilation, and parquet reader init
    // land here instead of inside the first timed query.
    try {
      sys.env.get("SPARK_GRAFT_WARMUP")
        .map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Seq("scan_projected", "agg_distinct_count"))
        .foreach(k =>
          SparkEntry.queries.get(k).foreach(f => f(spark, sfDir).count()))
    } catch { case _: Throwable => () }
    // Optional comma-separated subset for local iteration (the driver
    // never sets this, so round benches always cover the full inventory).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    // A failed query reports -1.0 (never a fake timing) and lands in
    // "errors" so a broken plan can't masquerade as a fast one.
    // Timed action: a NOOP WRITE, not count() — count() lets Catalyst
    // eliminate row-count-preserving work (a left join against a
    // unique-keyed aggregate, window columns nobody filters on), so an
    // op like llm_dedup_substring_prune would "bench" an emptied plan.
    // The noop sink executes every operator and materializes every
    // column on the executors, then discards the rows — the honest
    // full-plan cost, still with zero driver/disk transfer. (Streaming-
    // only shapes that reject batch writes fall back to count.)
    // SPARK_GRAFT_ACTION=count keeps the pre-round-9 action measurable
    // for continuity with the rounds 1-8 series and the 43.6 s anchor.
    val legacyCount = sys.env.get("SPARK_GRAFT_ACTION").contains("count")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try {
        val df = fn(spark, sfDir)
        if (legacyCount) { df.count(); () }
        else {
          try df.write.mode("overwrite").format("noop").save()
          catch { case _: org.apache.spark.sql.AnalysisException =>
            df.count(); ()
          }
        }
        true
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop per-query persist() blocks so cached signature/assignment
      // tables don't accumulate in the block manager across the
      // full-inventory session (each query pays its own cache build
      // above, inside its timing — no cross-query subsidy). release()
      // also frees the driver-side OpCache handle list, which
      // clearCache alone leaves growing for the session. One designed
      // exception: the shared cluster table (llm_dedup_clusters/prune)
      // is a temp-parquet materialization that survives both calls —
      // whichever of the two runs first pays the build, exactly like
      // production reading a materialized cluster table.
      graft.ops.OpCache.release(spark)
      spark.catalog.clearCache()
      (name, if (ok) dt else -1.0)
    }
    def fmt(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // The full per-query line is ~5 KB at 139 keys, but the round
    // artifact captures only the LAST 2000 chars of the run log — a
    // full-map println has never fit, so every BENCH_r*.json carried
    // "parsed": null. STDOUT gets a short line (same contract fields;
    // "queries" = the 30 slowest, the only ones a bench reader acts
    // on) guaranteed to fit the tail window; the complete map lands in
    // /tmp/graft_bench.json as the first-class record (copied into
    // BENCH_r*_samples/ each round).
    val slow = results.filter(_._2 >= 0).sortBy(-_._2).take(30)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val shortLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"queries":$slow,"errors":$errs,""" +
        s""""full":"/tmp/graft_bench.json","sf":"$sfDir"}"""
    println(shortLine)
    try {
      val w = new java.io.PrintWriter("/tmp/graft_bench.json")
      try w.println(line) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
