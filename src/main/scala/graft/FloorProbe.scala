package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Round-21 floor decomposition (guide §1: measure first): the round-20
  * scaling block showed ~165 sub-second keys whose 8-core/32-core ratio
  * is ~1 — per-query latency, not data-parallel work. Before touching
  * any conf, split each key's wall into
  *   build  = queries(k)(spark, sf)        (DataFrame construction)
  *   plan   = df.queryExecution.executedPlan (analysis+optimize+planning)
  *   exec   = noop write                    (jobs, codegen, run)
  * and count jobs/stages/tasks per key so the fixed per-job cost is
  * visible. Prints per-key lines and an aggregate tail.
  *
  * Usage: runMain graft.FloorProbe [keyFilterRegex]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val pat = args.headOption.getOrElse(".*").r
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
      })

    // same phase as the bench so reader keys time warm reads
    graft.ops.Scans.tableArtifactBuild(spark, sf, includeGraph = true,
      includeLlm = true, includeBucketed = true)
    // same untimed warmup as the bench
    Seq("scan_projected", "agg_distinct_count", "scan_parquet",
      "source_kafka_shape", "llm_token_bpe")
      .foreach(k => SparkEntry.queries.get(k).foreach(f =>
        f(spark, sf).count()))

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    var (tb, tp, te) = (0.0, 0.0, 0.0)
    var (nj, ns, nt, nk) = (0, 0, 0, 0)
    val keys = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => pat.findFirstIn(k).isDefined)
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      val j0 = jobs.get(); val s0 = stages.get(); val t0c = tasks.get()
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sf)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        try df.write.mode("overwrite").format("noop").save()
        catch { case _: org.apache.spark.sql.AnalysisException =>
          df.count(); () }
        val t3 = System.nanoTime()
        val (b, p, e) =
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        tb += b; tp += p; te += e; nk += 1
        val (dj, ds, dt) =
          (jobs.get() - j0, stages.get() - s0, tasks.get() - t0c)
        nj += dj; ns += ds; nt += dt
        println(s"FLOOR $k build=${fmt(b)} plan=${fmt(p)} " +
          s"exec=${fmt(e)} jobs=$dj stages=$ds tasks=$dt")
      } catch { case e: Throwable =>
        println(s"FLOOR $k FAILED ${e.getMessage}")
      }
      graft.ops.OpCache.release(spark)
      spark.catalog.clearCache()
    }
    println(s"FLOORTOTAL keys=$nk build=${fmt(tb)} plan=${fmt(tp)} " +
      s"exec=${fmt(te)} jobs=$nj stages=$ns tasks=$nt")
    spark.stop()
  }
}
