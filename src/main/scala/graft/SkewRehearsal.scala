package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-KEY rehearsal (round-10 verdict items 1-3 + the round-11
  * outer-interval-join fix): the operators whose earlier plans had skew
  * hazards — `cep_absence_timeout` (unbounded-following frame → O(n²)
  * per user), `ads_attribution` (user-only join key → clicks-ever
  * fan-in), `llm_dedup_substring` (gram-keyed window → full hot-gram
  * partition in one task), `join_interval_left_bucketed` (user-only
  * outer interval key → views×clicks on one bot user) — timed on
  * PURPOSE-BUILT skewed fixtures at two sizes, 10× apart. The fixed
  * plans are linear in the hot key's row count, so t(x10) must stay
  * ~10× t(x1) (the quadratic frame alone would be 100×: a 10⁵-event
  * hot user does 10¹⁰ window-buffer adds). One JSON line per fixture
  * size on stdout and in /tmp/graft_skew_rehearsal.json.
  *
  * Fixtures (deterministic, no RNG):
  *  - events: ONE bot user (user_id 1) with nHot clicks spread over
  *    300 days plus nHot/2 interleaved views, 50 purchases and
  *    background traffic from 1 000 normal users — per-72 h-window
  *    click density is nHot/100, so the
  *    bucketed attribution join's per-key fan-in is ~nHot/50 while the
  *    unbucketed formulation's was 50·nHot; the absence scan sees one
  *    nHot-row user partition.
  *  - documents: nHot docs sharing ONE verbatim 8-token boilerplate
  *    line (the hot gram) plus per-doc unique filler — the gram-count
  *    window would funnel all nHot rows of that gram through one task;
  *    the partial agg collapses them map-side.
  *
  * Usage: runMain graft.SkewRehearsal [mult ...]   (default: 1 10;
  * mult 1 = 10⁴ hot rows, 10 = 10⁵).
  */
object SkewRehearsal {

  private[graft] def synthEvents(s: SparkSession, dir: String, nHot: Long): Unit = {
    import s.implicits._
    if (new java.io.File(s"$dir/events.parquet/_SUCCESS").isFile) return
    val base = 1735689600000000L // 2025-01-01 UTC, micros
    val span = 300L * 86400000000L
    val hot = s.range(nHot).map { i =>
      // bot: clicks at even spacing over 300 days; every (nHot/50)th
      // event is a purchase so attribution has purchases to credit
      val ts = base + i * (span / nHot)
      val isPurch = nHot >= 50 && i % (nHot / 50) == (nHot / 50) - 1
      (i.toLong, ts, 1L, if (isPurch) "purchase" else "click",
        if (isPurch) 25.0 else 0.0)
    }
    // bot views interleaved between the clicks (distinct ids): the
    // outer interval join's hazard is views×clicks on ONE user — the
    // bucketed formulation's per-key fan-in stays at Δ-window density
    // (~2 clicks per 15-min bucket here) while the user-keyed plan
    // would build (nHot/2)·nHot candidate pairs before filtering
    val hotViews = s.range(nHot / 2).map { i =>
      val ts = base + (2 * i + 1) * (span / nHot) - (span / nHot) / 2
      (500000L + i, ts, 1L, "view", 0.0)
    }
    val bg = s.range(50000).map { i =>
      val ts = base + (i * 518400L + 7L) % span // co-prime stride
      val uid = 2L + i % 1000
      val kind = (i % 10) match {
        case 0 => "purchase"; case 1 | 2 => "click"; case _ => "view"
      }
      (1000000L + i, ts, uid, kind, if (kind == "purchase") 10.0 else 0.0)
    }
    hot.union(hotViews).union(bg)
      .toDF("event_id", "tsl", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def synthDocs(s: SparkSession, dir: String, nHot: Long): Unit = {
    import s.implicits._
    if (new java.io.File(s"$dir/documents.parquet/_SUCCESS").isFile) return
    // one verbatim 8-token boilerplate line (= exactly one hot K-gram at
    // K=8) in every doc, wrapped in unique filler so docs aren't exact
    // dups and no other gram repeats
    val boiler = "all rights reserved contact the site admin team"
    s.range(nHot).map { i =>
      val text = s"unique lead token${i}a token${i}b $boiler " +
        s"tail${i}c tail${i}d closing words here now"
      (i, text, "en", s"src${i % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    // _v2 suffix: the fixture gained hot-user views in round 11 and the
    // synth step skips dirs with a _SUCCESS marker, so a version bump is
    // what invalidates fixtures left by earlier rounds
    val root = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "/tmp/graft_skew_v2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ads_traffic_board rides the same bot-user fixture: its
    // sessionization window sorts the one nHot-row user partition —
    // O(n log n) per key, so t(x10) must stay ~10× t(x1)
    val ops = Seq("cep_absence_timeout", "ads_attribution",
      "llm_dedup_substring", "join_interval_left_bucketed",
      "ads_traffic_board")
    // warmup (codegen + reader init outside the timed region) runs
    // against the FIRST mult's own synthesized fixture — it exists by
    // construction, unlike a hardcoded corpus path that silently makes
    // the first timed op absorb the init cost on boxes without it
    val warmDir = s"$root/x${mults.head}"
    synthEvents(spark, warmDir, 10000L * mults.head)
    if (!sys.env.get("SPARK_GRAFT_SKEW_TRIO_ONLY").contains("1")) {
      synthDocs(spark, warmDir, 10000L * mults.head)
      try SparkEntry.queries("cep_absence_timeout")(
        spark, warmDir).write.mode("overwrite")
        .format("noop").save()
      catch { case _: Throwable => () }
    }
    val lines = mults.map { mult =>
      val nHot = 10000L * mult
      val dir = s"$root/x$mult"
      // SPARK_GRAFT_SKEW_TRIO_ONLY=1 skips the five standard op
      // timings (and the doc fixture they alone need) — for iterating
      // on the skew-join trio at multipliers where the op sweep would
      // dominate the wall clock
      val trioOnly = sys.env.get("SPARK_GRAFT_SKEW_TRIO_ONLY")
        .contains("1")
      synthEvents(spark, dir, nHot)
      if (!trioOnly) synthDocs(spark, dir, nHot)
      val timings = (if (trioOnly) Seq.empty[String] else ops).map { name =>
        val obs = org.apache.spark.sql.Observation()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val n = obs.get.get("n").map(_.asInstanceOf[Long]).getOrElse(-1L)
        graft.ops.OpCache.release(spark)
        spark.catalog.clearCache()
        (name, dt, n)
      }
      val secs = timings.map(t => s""""${t._1}":${"%.2f"
        .formatLocal(java.util.Locale.ROOT, t._2)}""")
        .mkString("{", ",", "}")
      val rows = timings.map(t => s""""${t._1}":${t._3}""")
        .mkString("{", ",", "}")
      // Skew-JOIN trio (round-12 verdict item 4): the same hot-user
      // fact ⋈ per-user-dim join computed three ways on this fixture —
      // (a) one shuffle join with ALL skew handling off (the hazard:
      // every hot-user row through one reducer), (b) the same plan
      // with AQE skew-join FORCED (the 100× production answer: runtime
      // split of the oversized partition, no query rewrite), (c) the
      // manual salt (the `join_skew_salted` shape, the fallback when
      // AQE's byte-size heuristics don't fire). The dim is
      // MATERIALIZED to parquet first and shared by all three:
      // OptimizeSkewedJoin only matches Sort(ShuffleQueryStage)
      // directly under the join on both sides, so an inline aggregate
      // between the dim's sort and its shuffle silently defeats the
      // rule (measured round 13; PlanSpec pins the skew=true split on
      // exactly this shape). Broadcast is disabled for all three so
      // the dim never short-circuits the shuffle under test;
      // thresholds are scaled to the fixture's measured partition
      // bytes (hot reducer 897 KB vs 15 KB median at ×10) the same way
      // production tunes them to its own.
      val ev = graft.ops.Tables.events(spark, dir)
      ev.groupBy("user_id").agg(count(lit(1)).as("user_events"))
        .write.mode("overwrite").parquet(s"$dir/user_dim.parquet")
      def fact() = graft.ops.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      def dim() = spark.read.parquet(s"$dir/user_dim.parquet")
      def unsalted() =
        fact().join(dim(), Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("user_events"))
          .orderBy("event_id")
      def salted() = {
        val salts = 8
        val sf = fact().withColumn("salt", pmod(col("event_id"), lit(salts)))
        val sd = dim().crossJoin(spark.range(0, salts)
          .select(col("id").cast("int").as("salt")))
        sf.join(sd, Seq("user_id", "salt"))
          .select(col("event_id"), col("user_id"), col("user_events"))
          .orderBy("event_id")
      }
      def timedNoop(df: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.OpCache.release(spark)
        spark.catalog.clearCache()
        dt
      }
      def withConfs(kv: (String, String)*)(body: => Double): Double = {
        val saved = kv.map { case (k, _) =>
          (k, spark.conf.getOption(k)) }
        kv.foreach { case (k, v) => spark.conf.set(k, v) }
        try body finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      val noBcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
      val tPlain = withConfs(noBcast,
        "spark.sql.adaptive.skewJoin.enabled" -> "false")(
        timedNoop(unsalted()))
      val tAqe = withConfs(noBcast,
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
          -> "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k")(
        timedNoop(unsalted()))
      val tSalt = withConfs(noBcast,
        "spark.sql.adaptive.skewJoin.enabled" -> "false")(
        timedNoop(salted()))
      val trio = s"""{"plain_smj":${"%.2f".formatLocal(
        java.util.Locale.ROOT, tPlain)},"aqe_skew":${"%.2f".formatLocal(
        java.util.Locale.ROOT, tAqe)},"manual_salt":${"%.2f".formatLocal(
        java.util.Locale.ROOT, tSalt)}}"""
      val line =
        s"""{"skew":{"mult":$mult,"hot_rows":$nHot,"secs":$secs,""" +
          s""""rows":$rows,"skew_join_trio":$trio}}"""
      println(line)
      line
    }
    try {
      val w = new java.io.PrintWriter("/tmp/graft_skew_rehearsal.json")
      try lines.foreach(w.println) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
