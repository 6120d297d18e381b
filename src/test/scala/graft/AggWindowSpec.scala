package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.4 aggregation + §2.5 window-function invariants. */
class AggWindowSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_group_multi group counts sum to the filtered row count") {
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    val got = q("agg_group_multi").agg(sum("count_order")).first().getLong(0)
    assert(got === expected)
  }

  test("agg_pivot per-user counts sum to total events") {
    val total = ops.Tables.events(spark, sf).count()
    val summed = q("agg_pivot")
      .select((col("n_view") + col("n_click") + col("n_purchase") +
        col("n_signup") + col("n_error")).as("s"))
      .agg(sum("s")).first().getLong(0)
    assert(summed === total)
  }

  test("agg_grouping_sets: gid=3 grand total equals orders count") {
    val grand = q("agg_grouping_sets").where(col("gid") === 3)
    assert(grand.count() === 1)
    assert(grand.first().getAs[Long]("n") ===
      spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("uv <= pv and approx uv within 10% of exact") {
    val exact = q("agg_distinct_count")
    assert(exact.where(col("uv") > col("pv")).count() === 0)
    val joined = exact.join(q("agg_approx_distinct"), "event_type")
    val off = joined.where(
      abs(col("uv_approx") - col("uv")) > col("uv") * 0.1).count()
    assert(off === 0)
  }

  test("agg_approx_percentile tracks exact percentiles within 3%") {
    // approx_percentile returns an actual element; exact `percentile`
    // interpolates — adjacent order statistics differ by ~1% in the
    // small fixture groups, so 3% bounds sketch error + discreteness.
    val exact = q("agg_percentile")
    val approx = q("agg_approx_percentile")
      .withColumnRenamed("p25", "a25").withColumnRenamed("p50", "a50")
      .withColumnRenamed("p75", "a75")
    val off = exact.join(approx, "o_orderpriority")
      .where(abs(col("a25") - col("p25")) > abs(col("p25")) * 0.03 ||
        abs(col("a50") - col("p50")) > abs(col("p50")) * 0.03 ||
        abs(col("a75") - col("p75")) > abs(col("p75")) * 0.03)
    assert(off.count() === 0)
  }

  test("sketch merge: daily HLL union == direct sketch, within 10% of exact") {
    val merged = q("agg_sketch_merge")
    // datasketches HLL union at equal lgK is lossless: merging per-day
    // sketches must give EXACTLY the direct single-pass estimate
    val direct = ops.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("uv_direct"))
    assert(merged.join(direct, "event_type")
      .where(col("uv_sketch") =!= col("uv_direct")).count() === 0)
    val exact = q("agg_distinct_count")
    assert(merged.join(exact, "event_type")
      .where(abs(col("uv_sketch") - col("uv")) > col("uv") * 0.1)
      .count() === 0)
  }

  test("agg_udaf_typed weighted avg lies within [min, max] price") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val mm = li.agg(min("l_extendedprice"), max("l_extendedprice")).first()
    val bad = q("agg_udaf_typed")
      .where(col("wavg_price") < mm.getDouble(0) ||
        col("wavg_price") > mm.getDouble(1)).count()
    assert(bad === 0)
  }

  test("win_rank_topn: at most 3 per group, and they are the max prices") {
    val topn = q("win_rank_topn")
    assert(topn.groupBy("o_orderpriority").count()
      .where(col("count") > 3).count() === 0)
    // rank-1 rows carry the group max price
    val maxes = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(round(max("o_totalprice"), 2).as("mx"))
    val r1 = topn.where(col("rn") === 1)
    assert(r1.join(maxes, "o_orderpriority")
      .where(col("o_totalprice") =!= col("mx")).count() === 0)
  }

  test("win_running_frame cumulative sums are non-decreasing per partition") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy("o_date_us", "o_orderkey")
    val bad = q("win_running_frame")
      .withColumn("prev", lag(col("cum_rows"), 1).over(w))
      .where(col("prev").isNotNull && col("cum_rows") < col("prev"))
    assert(bad.count() === 0)
  }

  test("win_lag_lead gaps are non-negative (ordered by ts)") {
    assert(q("win_lag_lead").where(col("gap_us") < 0).count() === 0)
  }

  test("sort_limit_topk is the sorted prefix of orders") {
    val topk = q("sort_limit_topk")
    assert(topk.count() === 100)
    val kth = topk.agg(min("o_totalprice")).first().getDouble(0)
    val higher = spark.read.parquet(s"$sf/orders.parquet")
      .where(round(col("o_totalprice"), 2) > kth).count()
    assert(higher < 100)
  }

  test("set ops algebra: |A∪B| = |A|+|B|; except removes exactly B") {
    val ev = ops.Tables.events(spark, sf)
    val nView = ev.where(col("event_type") === "view").count()
    val nSignup = ev.where(col("event_type") === "signup").count()
    assert(q("set_union_all").count() === nView + nSignup)
    val exc = q("set_except")
    assert(exc.count() > 0, "except must be verified on a non-empty set")
    val big = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey")).distinct()
    assert(exc.join(big, "custkey").count() === 0)
    assert(exc.count() + big.count() ===
      spark.read.parquet(s"$sf/customer.parquet").count())
    // join_anti computes the same set via NOT EXISTS
    assert(q("join_anti").count() === exc.count())
    // distinct UNION = |viewers ∪ purchasers| with each user once:
    // equals the distinct count of the unioned bag, and is bounded by
    // the sum of the two distinct sides (strictly below when overlap
    // exists — which set_intersect above proves non-empty)
    val un = q("set_union")
    val dv = ev.where(col("event_type") === "view")
      .select("user_id").distinct().count()
    val dp = ev.where(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(un.count() ===
      ev.where(col("event_type").isin("view", "purchase"))
        .select("user_id").distinct().count())
    assert(un.count() <= dv + dp)
    assert(un.select("user_id").distinct().count() === un.count())
  }

  test("bag set ops: multiplicities subtract (except all) and take the " +
      "pairwise min (intersect all)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    // EXCEPT ALL row count is exactly total minus the removed bag
    assert(q("set_except_all").count() ===
      orders.count() - orders.where(col("o_totalprice") > 300000).count())
    // INTERSECT ALL: per user min(n_view, n_purchase), checked exactly
    // (Tables.events, not a bare read — events.parquet is TIMESTAMP(NANOS))
    val ev = ops.Tables.events(spark, sf)
    val perUser = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(count(lit(1)).as("nv"))
      .join(ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("np")), "user_id")
      .select(least(col("nv"), col("np")).as("m"))
      .agg(sum("m")).first().getLong(0)
    assert(q("set_intersect_all").count() === perUser)
    // and the distinct variant is a strict compression of the bag
    assert(q("set_intersect").count() < q("set_intersect_all").count())
  }

  test("bucketed interval join stays exact under a hot-key skew burst") {
    // one bot user with a dense event history — the exact shape that
    // melts the user-keyed plain join at scale. Build both formulations
    // directly on the synthetic frame and compare pair sets.
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")
    val evs = (0 until 600).map { i =>
      // events every 97 seconds, alternating kinds, all same user
      val kind = if (i % 2 == 0) "view" else "click"
      (7L, i.toLong, kind,
        new java.sql.Timestamp(base.getTime + i * 97000L))
    }.toDF("user_id", "event_id", "event_type", "ts")
    def v = evs.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    def c = evs.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val range = col("c_ts") >= col("v_ts") &&
      col("c_ts") <= col("v_ts") + expr("interval 15 minutes")
    val plain = v.join(c, col("v_user") === col("c_user") && range)
      .select(col("view_id"), col("click_id"))
    val bkt = 900L * 1000000L
    val vb = v.withColumn("b", explode(array(
      floor(unix_micros(col("v_ts")) / bkt),
      floor(unix_micros(col("v_ts")) / bkt) + 1)))
    val cb = c.withColumn("b", floor(unix_micros(col("c_ts")) / bkt))
    val bucketed = vb.join(cb,
        col("v_user") === col("c_user") && vb("b") === cb("b") && range)
      .select(col("view_id"), col("click_id"))
    assert(plain.count() > 1000, "burst must produce a dense pair set")
    assert(bucketed.count() === plain.count())
    assert(plain.exceptAll(bucketed).count() === 0)
  }

  test("join_interval_bucketed is row-identical to join_interval") {
    // the bucketed re-key must not change semantics: every (view, click)
    // pair within the 15-min range appears exactly once on both plans
    val plain = q("join_interval")
    val bucketed = q("join_interval_bucketed")
    assert(plain.count() > 0, "fixture must exercise the range join")
    assert(bucketed.count() === plain.count())
    assert(plain.exceptAll(bucketed).count() === 0)
    assert(bucketed.exceptAll(plain).count() === 0)
  }

  test("win_gapfill: spine is contiguous hours; gaps carry the last " +
      "observed revenue forward") {
    val df = q("win_gapfill").cache()
    try {
      val rows = df.collect()
      // contiguous spine: row count == hours between first and last
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:00")
      def h(s: String) = java.time.LocalDateTime.parse(s, fmt)
      val span = java.time.Duration
        .between(h(rows.head.getString(0)), h(rows.last.getString(0)))
        .toHours + 1
      assert(rows.length.toLong === span)
      // gap rows: zero events, null revenue, filled == previous filled
      var lastFilled = Double.NaN
      rows.foreach { r =>
        val isGap = r.getBoolean(5)
        assert(isGap === r.isNullAt(2))
        if (isGap) {
          assert(r.getLong(1) === 0L)
          assert(r.getDouble(3) === lastFilled) // LOCF
          // lerp fill stays between its two anchor values (and exists)
          assert(!r.isNullAt(4))
        } else {
          assert(r.getDouble(3) === r.getDouble(2))
          assert(r.getDouble(4) === r.getDouble(2)) // lerp = value itself
        }
        lastFilled = r.getDouble(3)
      }
      // interior gap runs: lerp is bounded by the surrounding known
      // values and moves monotonically between them
      rows.sliding(3).foreach {
        case Array(a, b, c) if b.getBoolean(5) =>
          val lo = math.min(a.getDouble(4), c.getDouble(4))
          val hi = math.max(a.getDouble(4), c.getDouble(4))
          assert(b.getDouble(4) >= lo - 1e-9 && b.getDouble(4) <= hi + 1e-9,
            s"lerp ${b.getDouble(4)} outside [$lo, $hi] at ${b.getString(0)}")
        case _ =>
      }
      // the fixture actually exercises the fill path
      assert(rows.count(_.getBoolean(5)) > 0, "no gaps in fixture")
    } finally df.unpersist()
  }
}
