package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ADS-layer metrics + the round-4 sampling/mode additions. */
class AdsSpec extends AnyFunSuite {
  import TestSpark._

  test("ads_retention_daily: rates in [0,1], retained bounded by dau") {
    val r = q("ads_retention_daily")
    assert(r.count() > 0)
    assert(r.where(col("retention") < 0 || col("retention") > 1)
      .count() === 0)
    assert(r.where(col("retained") > col("dau")).count() === 0)
  }

  test("ads_gmv_cumulative: running total ends at the global GMV sum") {
    val r = q("ads_gmv_cumulative").collect()
    assert(r.nonEmpty)
    val totalDaily = r.map(_.getAs[Double]("gmv")).sum
    val lastCum = r.last.getAs[Double]("cum_gmv")
    assert(math.abs(totalDaily - lastCum) < 0.01, s"$totalDaily vs $lastCum")
    // monotone non-decreasing (gmv per day is non-negative); sliding(2)
    // yields a size-1 window on a 1-row result, so filter to real pairs
    r.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("cum_gmv") >= a.getAs[Double]("cum_gmv") - 1e-9)
    }
  }

  test("sql_ads_board: SQL front door agrees with the DataFrame surface") {
    val df = q("sql_ads_board").cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("revenue") <= 0).count() === 0)
      assert(df.where(col("buyers") > col("n_purchases")).count() === 0)
      // the SQL board's purchase total must equal the DataFrame ops'
      // view of the same fact table
      val purchases = spark.read.parquet(s"$sf/events.parquet")
        .where(col("event_type") === "purchase").count()
      assert(df.agg(sum("n_purchases")).first().getLong(0) === purchases)
    } finally df.unpersist()
  }

  test("ads_path_topn: valid 3-step paths, descending counts, exact total") {
    val r = q("ads_path_topn").collect()
    assert(r.nonEmpty && r.length <= 10)
    val types = Set("view", "click", "purchase", "signup", "error")
    r.foreach { row =>
      val steps = row.getAs[String]("path").split(">")
      assert(steps.length === 3 && steps.forall(types.contains))
    }
    // counts are non-increasing and ties break by path asc
    r.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      val (na, nb) = (a.getAs[Long]("n"), b.getAs[Long]("n"))
      assert(na > nb || (na == nb &&
        a.getAs[String]("path") < b.getAs[String]("path")))
    }
    // independent brute-force oracle on the tiny corpus: simulate the
    // sessionization + triple walk driver-side and compare the top-10
    val ev = graft.ops.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime * 1000,
        x.getLong(2), x.getString(3)))
      .groupBy(_._1)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    ev.values.foreach { rows =>
      val sorted = rows.toSeq.map(e => (e._2, e._3, e._4)).sorted
      var sess = List.empty[List[String]]
      sorted.zipWithIndex.foreach { case ((ts, _, ty), i) =>
        val newSess = i == 0 || ts - sorted(i - 1)._1 > 1800000000L
        sess = if (newSess) List(ty) :: sess
          else (ty :: sess.head) :: sess.tail
      }
      sess.map(_.reverse).foreach { types =>
        types.sliding(3).filter(_.length == 3).foreach { tri =>
          val p = tri.mkString(">")
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = r.map(row => (row.getAs[String]("path"), row.getAs[Long]("n")))
    assert(got.toSeq === want)
  }

  test("ads_ab_lift: arms partition users, rates exact, z sign consistent") {
    val row = q("ads_ab_lift").collect().head
    val users = graft.ops.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val nA = row.getAs[Long]("n_a"); val nB = row.getAs[Long]("n_b")
    assert(nA + nB === users)
    val convA = row.getAs[Long]("conv_a"); val convB = row.getAs[Long]("conv_b")
    assert(convA <= nA && convB <= nB)
    assert(row.getAs[Double]("rate_a") ===
      math.round(convA.toDouble / nA * 1e6) / 1e6)
    val z = row.getAs[Double]("z")
    val dr = row.getAs[Double]("rate_b") - row.getAs[Double]("rate_a")
    assert(z.sign === dr.sign || dr == 0.0)
  }

  test("ads_rfm_segments: exhaustive over buyers, well-formed labels, " +
      "monetary adds up") {
    val r = q("ads_rfm_segments").collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(
      row.getAs[String]("segment").matches("R[1-4]F[1-4]M[1-4]")))
    val buyers = graft.ops.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(r.map(_.getAs[Long]("n_users")).sum === buyers)
    val gmv = graft.ops.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .agg(sum(round(col("value"), 2))).first().getDouble(0)
    assert(math.abs(r.map(_.getAs[Double]("monetary")).sum - gmv) < 0.5)
  }

  test("ads_anomaly_zscore: z matches a driver-side recomputation and " +
      "the flag is |z| > 2") {
    val daily = graft.ops.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value").cast(graft.ops.Tables.dec) * 100, 0)
        .cast("long")).as("c"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val want = daily.indices.flatMap { i =>
      val hist = daily.slice(math.max(0, i - 7), i).map(_._2)
      if (hist.length < 3) None
      else {
        val nn = hist.length.toDouble
        val s1d = hist.sum.toDouble
        val s2d = hist.map(c => BigInt(c) * BigInt(c)).sum.toDouble
        val vr = (s2d - s1d * s1d / nn) / (nn - 1)
        val z = if (vr > 0)
          Some((daily(i)._2.toDouble - s1d / nn) / math.sqrt(vr))
          else None
        Some((daily(i)._1, z))
      }
    }
    val got = q("ads_anomaly_zscore").orderBy("day").collect()
      .map(r => (r.getAs[String]("day"),
        Option(r.getAs[java.lang.Double]("z")).map(_.toDouble),
        Option(r.getAs[java.lang.Boolean]("is_anomaly"))))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gd, gz, flag), (wd, wz)) =>
      assert(gd === wd)
      assert(gz.isDefined === wz.isDefined, gd)
      // the op rounds to 4 dp; the reference is unrounded
      gz.zip(wz).foreach { case (g, w) =>
        assert(math.abs(g - w) < 5.1e-5, s"$gd: $g vs $w") }
      assert(flag === gz.map(v => math.abs(v) > 2), gd)
    }
  }

  test("agg_mode: modal count equals the true per-user max frequency") {
    val mode = q("agg_mode")
    val truth = graft.ops.Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("tn"))
      .groupBy("user_id").agg(max(col("tn")).as("max_n"))
    val diff = mode.join(truth, "user_id")
      .where(col("n") =!= col("max_n"))
    assert(diff.count() === 0)
  }

  test("llm_dedup_clusters: empty similarity graph → all singletons") {
    // No fixture exercises the zero-pairs path (empty edge set → empty
    // label table → left-join coalesce); three mutually-dissimilar docs
    // must each form their own cluster.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nodup").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s1", 0, 36),
      (2L, "one two three four five six", "en", "s1", 0, 27),
      (3L, "red green blue yellow purple orange", "en", "s1", 0, 35))
      .toDF("doc_id", "text", "lang", "source", "label", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("llm_dedup_clusters")(spark, dir)
      .collect().map(row => (row.getAs[Long]("doc_id"),
        row.getAs[Long]("cluster_id"), row.getAs[Long]("cluster_size"),
        row.getAs[Boolean]("is_canon")))
    assert(r.toSeq === Seq((1L, 1L, 1L, true), (2L, 2L, 1L, true),
      (3L, 3L, 1L, true)))
  }

  test("llm_sample_split: deterministic, exhaustive, ~80/10/10") {
    val s1 = q("llm_sample_split")
    val total = s1.count()
    assert(total === graft.ops.Tables.t(spark, sf, "documents").count())
    val frac = s1.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1) * 1.0 / total).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac)
    assert(frac.getOrElse("val", 0.0) > 0.02 && frac("val") < 0.2, frac)
    assert(frac.getOrElse("test", 0.0) > 0.02 && frac("test") < 0.2, frac)
    // determinism: a second evaluation assigns identical splits
    val s2 = q("llm_sample_split").withColumnRenamed("split", "split2")
      .select("doc_id", "split2")
    assert(s1.join(s2, "doc_id").where(col("split") =!= col("split2"))
      .count() === 0)
  }

  test("ads_cohort_matrix: offset-0 retention is 1.0 and actives never " +
      "exceed the cohort") {
    val m = q("ads_cohort_matrix").cache()
    try {
      assert(m.count() > 0)
      // every user is active in their own cohort week by construction
      assert(m.where(col("week_offset") === 0 &&
        (col("active_users") =!= col("cohort_size") ||
          col("retention") =!= 1.0)).count() === 0)
      assert(m.where(col("week_offset") < 0 ||
        col("active_users") > col("cohort_size") ||
        col("retention") <= 0 || col("retention") > 1).count() === 0)
      // cohort sizes partition the user base exactly once
      val users = m.where(col("week_offset") === 0)
        .agg(sum(col("cohort_size"))).first().getLong(0)
      assert(users === graft.ops.Tables.events(spark, sf)
        .select("user_id").distinct().count())
    } finally m.unpersist()
  }

  test("ads_attribution: both models distribute the same attributed value") {
    val r = q("ads_attribution").cache()
    try {
      assert(r.count() > 0)
      assert(r.where(col("last_touch_rev") < 0 || col("linear_rev") < 0 ||
        col("n_touches") <= 0).count() === 0)
      // last-touch credits each attributed purchase's full value exactly
      // once; linear splits the same value across its touches — so the
      // two models' GLOBAL totals agree up to rounding: 6 dp per share
      // (touches × 5e-7) plus the 2 dp per-day output rounding
      // (days × 5e-3)
      val tot = r.agg(sum("last_touch_rev"), sum("linear_rev"),
        sum("n_touches")).first()
      val (lt, lin, nt) =
        (tot.getDouble(0), tot.getDouble(1), tot.getLong(2))
      assert(math.abs(lt - lin) <= nt * 5e-7 + r.count() * 5e-3 + 0.01,
        s"$lt vs $lin")
      // attributed value can't exceed total purchase value
      val totalPurch = graft.ops.Tables.events(spark, sf)
        .where(col("event_type") === "purchase")
        .agg(sum(col("value"))).first().getDouble(0)
      assert(lt <= totalPurch + 0.01)
    } finally r.unpersist()
  }

  test("ads_province_board: regional rollup conserves orders, buyers, " +
      "and revenue") {
    val r = q("ads_province_board").cache()
    try {
      val orders = graft.ops.Tables.t(spark, sf, "orders")
      val tot = r.agg(sum("n_orders"), sum("buyers"), sum("revenue"))
        .first()
      assert(tot.getLong(0) === orders.count())
      assert(tot.getLong(1) ===
        orders.select("o_custkey").distinct().count())
      val rev = orders.agg(
        sum(col("o_totalprice").cast(graft.ops.Tables.dec))).first()
        .getDecimal(0).doubleValue()
      // per-(region,nation) 2-dp output rounding only
      assert(math.abs(tot.getDouble(2) - rev) <= r.count() * 5e-3 + 0.01)
      // aov is the per-group mean order value: between 0 and revenue
      r.collect().foreach { row =>
        val aov = row.getAs[Double]("aov")
        assert(aov > 0 && aov * row.getAs[Long]("n_orders") <=
          row.getAs[Double]("revenue") + row.getAs[Long]("n_orders") * 1e-4)
      }
    } finally r.unpersist()
  }

  test("ads_traffic_board: pv conserves events, sessions conserve the " +
      "sessionization, bounce rate bounded") {
    val r = q("ads_traffic_board").cache()
    try {
      val ev = graft.ops.Tables.events(spark, sf)
      val tot = r.agg(sum("pv"), sum("sessions"),
        sum("bounce_sessions")).first()
      assert(tot.getLong(0) === ev.count())
      // every session starts on exactly one day, so daily session
      // counts sum to the corpus-wide session count — which equals the
      // number of session-starting events (new_sess sums)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(graft.ops.Tables.ep(col("ts")), col("event_id"))
      val gapUs = graft.ops.Tables.ep(col("ts")) -
        lag(graft.ops.Tables.ep(col("ts")), 1).over(w)
      val nSess = ev.withColumn("new_sess",
          when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .agg(sum("new_sess")).first().getLong(0)
      assert(tot.getLong(1) === nSess)
      assert(tot.getLong(2) <= tot.getLong(1))
      r.collect().foreach { row =>
        val br = row.getAs[Double]("bounce_rate")
        assert(br >= 0 && br <= 1)
        assert(row.getAs[Double]("avg_session_sec") >= 0)
        assert(row.getAs[Long]("uv") <= row.getAs[Long]("pv"))
      }
    } finally r.unpersist()
  }
  test("ads_top_products: <=3 per month, rn contiguous, revenue " +
      "non-increasing, board == pre-publish computation") {
    val r = q("ads_top_products").collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("m_us")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rn"))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[Long]("rn")).toSeq ==
        (1L to sorted.length).toSeq)
      // ties broke on partkey, so revenue is non-increasing in rank
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(b.getAs[Double]("revenue") <=
          a.getAs[Double]("revenue") + 1e-9)
      }
    }
    // the JDBC round-trip must not have perturbed a single value
    val direct = graft.ops.Ads.topProductsBoard(spark, sf)
      .orderBy("m_us", "rn").collect()
    assert(direct.length == r.length)
    direct.zip(r).foreach { case (a, b) =>
      assert(a.getAs[Long]("m_us") == b.getAs[Long]("m_us"))
      assert(a.getAs[Long]("rn") == b.getAs[Long]("rn"))
      assert(a.getAs[Long]("l_partkey") == b.getAs[Long]("l_partkey"))
      assert(a.getAs[String]("p_brand") == b.getAs[String]("p_brand"))
      assert(a.getAs[Double]("revenue") == b.getAs[Double]("revenue"))
    }
  }
}
