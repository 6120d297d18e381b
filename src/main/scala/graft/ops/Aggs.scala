package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — aggregation: global / grouped / distinct / approx /
  * grouping-sets / pivot / typed UDAF / collect-state.
  *
  * Flink anchors: keyBy(...).aggregate(AggregateFunction), Table
  * GROUPING SETS / PIVOT, MapState UV dedup, ListState accumulation.
  *
  * Scale notes: everything here is a hash aggregate with map-side partial
  * aggregation (Catalyst plans partial+final automatically), so the shuffle
  * carries one row per (partition, group) — the plan that survives 100 TB.
  * Money sums accumulate in DECIMAL(18,2) (order-independent across
  * partitions); the oracle mirrors the same decimal-then-double arithmetic.
  */
object Aggs {
  import Tables._

  /** Typed UDAF (Flink AggregateFunction analog): weighted average of
    * price by quantity, accumulated as (sum(x*w), sum(w)). */
  private object WeightedAvg
      extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) 0.0 else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val pivotTypes = Seq("view", "click", "purchase", "signup", "error")

  val queries: Map[String, Q] = Map(
    // Global DWS totals: one row, partial+final agg, no groupBy shuffle fan-out.
    "agg_hash_global" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_discount")).as("avg_disc"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        ep(min(col("l_shipdate"))).as("min_ship_us"),
        ep(max(col("l_shipdate"))).as("max_ship_us"))),

    // TPC-H Q1 shape: multi-key grouped agg over the biggest table.
    "agg_group_multi" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Exact UV per event type (genre MapState dedup-count).
    "agg_distinct_count" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("uv"),
          count(lit(1)).as("pv"))
        .orderBy("event_type")),

    // Approximate UV (HLL++) for 100 TB scale; oracle-exempt per contract
    // (approx ≠ DuckDB exact). Driver records rows-only check.
    "agg_approx_distinct" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("uv_approx"))
        .orderBy("event_type")),

    // Multi-dim rollup for the ADS layer; grouping_id distinguishes levels.
    "agg_grouping_sets" -> ((s, d) =>
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Full CUBE (all 2^k grouping sets — rollup above covers the
    // hierarchy prefix sets): per (flag, status) plus both one-
    // dimension subtotals plus the grand total, disambiguated by
    // grouping_id. Same partial-aggregation plan as any hash agg —
    // Spark expands the sets map-side.
    "agg_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("total"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Wide table: event counts pivoted by type per user (Table PIVOT).
    "agg_pivot" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", pivotTypes)
        .agg(count(lit(1)))
        .na.fill(0, pivotTypes)
        .select(col("user_id") +: pivotTypes.map(v => col(v).as(s"n_$v")): _*)
        .orderBy("user_id")),

    // Conditional/boolean aggregates (the DWS quality-gate shapes).
    "agg_bool_countif" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(count_if(col("value") > 2.5).as("n_high"),
          bool_and(col("value") >= 0).as("all_nonneg"),
          bool_or(col("value") > 9.5).as("any_big"))
        .orderBy("event_type")),

    // Statistical moments per group (stddev in both engines is the
    // numerically-stable online form; rounding absorbs low-bit drift).
    "agg_stats" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(round(stddev_samp(col("o_totalprice")), 2).as("sd"),
          round(corr(col("o_totalprice"), col("o_custkey")), 4).as("cr"),
          round(avg(col("o_totalprice")), 4).as("mean"),
          round(min(col("o_totalprice")), 2).as("mn"),
          round(max(col("o_totalprice")), 2).as("mx"))
        .orderBy("o_orderpriority")),

    // Exact percentiles with linear interpolation (Spark `percentile` ≙
    // DuckDB `quantile_cont`).
    "agg_percentile" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
        .orderBy("o_orderpriority")),

    // Sketch-mergeable percentiles (KLL-style approx_percentile): the
    // 100 TB companion to agg_percentile — exact `percentile` buffers
    // every group value; the sketch is bounded-memory and mergeable
    // across partitions. Oracle-exempt (approx ≠ DuckDB exact);
    // tolerance-tested vs exact in AggWindowSpec.
    "agg_approx_percentile" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("approx_percentile(o_totalprice, 0.25, 10000)").as("p25"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
          expr("approx_percentile(o_totalprice, 0.75, 10000)").as("p75"))
        .orderBy("o_orderpriority")),

    // Mergeable-sketch rollup (the incremental-UV pattern a 100 TB
    // warehouse runs): per-day HLL sketches built once, then UNIONED per
    // event type — re-aggregation reads tiny sketch blobs, never the raw
    // events again. Datasketches HLL union is lossless at equal lgK, so
    // the merged estimate is bit-identical to a direct single-pass
    // sketch (property-tested); oracle-exempt (approx vs DuckDB exact).
    "agg_sketch_merge" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("uv_sketch"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")),

    // EXACT distinct-count via mergeable bitmaps (the genre's
    // RoaringBitmap UV pattern): per-bucket bitmaps of bit positions,
    // OR-merged, popcounted. Unlike HLL this is exact — so it oracles
    // against plain count(DISTINCT) — while staying shuffle-light: the
    // shuffle carries one bitmap per (group, bucket), not one row per
    // distinct member.
    "agg_bitmap_uv" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"),
          bitmap_bucket_number(col("user_id")).as("bkt"))
        .agg(bitmap_construct_agg(bitmap_bit_position(col("user_id")))
          .as("bm"))
        .groupBy("event_type")
        .agg(sum(bitmap_count(col("bm"))).as("uv_bitmap"))
        .orderBy("event_type")),

    // Custom typed Aggregator registered as a UDAF (Flink AggregateFunction).
    "agg_udaf_typed" -> ((s, d) => {
      val wavg = udaf(WeightedAvg)
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4)
          .as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // Per-key set accumulation (ListState analog), emitted as a sorted
    // joined string so the oracle compare is order- and type-stable.
    "agg_collect_state" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",")
          .as("types"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")),

    // Modal value per group (each user's most frequent event type) with
    // a deterministic tie-break (smallest type string): min_by over the
    // (-count, value) struct — lexicographic struct order gives max
    // count then min string. Two aggregate levels, no window or join:
    // the count is a HashAggregate, the min_by a SortAggregate (struct
    // buffers aren't hash-aggregable) — both run partial+final, so
    // everything combines map-side before the (user_id) shuffle.
    "agg_mode" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(min_by(struct(col("event_type"), col("n")),
          struct((-col("n")).as("nn"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_type").as("mode_type"),
          col("m.n").as("n"))
        .orderBy("user_id")),

    // Fixed-width histogram per group (the distribution-profiling agg a
    // quality dashboard runs): 50k-wide price buckets per order
    // priority with explicit bounds. Bucketing is integer arithmetic
    // (no float bin edges), one hash-agg shuffle on the compound key.
    "agg_hist" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .groupBy("o_orderpriority", "bucket")
        .agg(count(lit(1)).as("n"))
        .select(col("o_orderpriority"), col("bucket"),
          (col("bucket") * 50000).as("lo"),
          ((col("bucket") + 1) * 50000).as("hi"), col("n"))
        .orderBy("o_orderpriority", "bucket")),

    // Ordered string aggregation via Spark 4.1's native LISTAGG
    // (round 13; the report-facing face of collect_list — ANSI
    // 2016's within-group ordered concat, previously only
    // expressible as sort_array(collect_list(...)) + array_join):
    // per user, the DISTINCT sorted set of event types as one
    // comma-joined column, plus the event count. The WITHIN GROUP
    // ordering makes the output deterministic under any partition
    // order — without it a distributed string agg is nondeterministic
    // by construction, which is why the unordered form never appears
    // in this engine. One keyed shuffle; the per-group value is
    // bounded by |event types| (small domain), not row count.
    "agg_listagg" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .agg(expr("listagg(DISTINCT event_type, ',') WITHIN GROUP " +
          "(ORDER BY event_type)").as("types"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")),

    // UNPIVOT / melt (round 13; the inverse of agg_pivot and the
    // report-layer wide→long reshape every BI export needs): the
    // per-priority board's three measure columns become (metric,
    // value) rows via the native Dataset.unpivot — a map-side
    // Expand (3 output rows per input row), no shuffle beyond the
    // aggregate that builds the wide table. Measures pre-cast to one
    // DOUBLE type (unpivot requires a common value type — same rule
    // as SQL UNPIVOT); money sums in DECIMAL first, as everywhere.
    "agg_unpivot" -> ((s, d) => {
      val dec = "decimal(18,2)"
      val wide = t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("double").as("n_orders"),
          round(sum(col("o_totalprice").cast(dec)).cast("double"), 2)
            .as("revenue"),
          round(sum(col("o_totalprice").cast(dec)).cast("double") /
            count(lit(1)), 2).as("avg_price"))
      wide.unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("revenue"), col("avg_price")),
          "metric", "value")
        .orderBy("o_orderpriority", "metric")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "agg_hash_global" ->
      """SELECT count(*) AS n_rows,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
        | round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
        | count(DISTINCT l_suppkey) AS n_supp,
        | epoch_us(min(l_shipdate)) AS min_ship_us,
        | epoch_us(max(l_shipdate)) AS max_ship_us
        |FROM lineitem""".stripMargin,
    "agg_group_multi" ->
      """SELECT l_returnflag, l_linestatus,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice * (1-l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_disc_price,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct_count" ->
      """SELECT event_type, count(DISTINCT user_id) AS uv, count(*) AS pv
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (event_type='view') AS n_view,
        | count(*) FILTER (event_type='click') AS n_click,
        | count(*) FILTER (event_type='purchase') AS n_purchase,
        | count(*) FILTER (event_type='signup') AS n_signup,
        | count(*) FILTER (event_type='error') AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_bool_countif" ->
      """SELECT event_type, CAST(count_if(value > 2.5) AS BIGINT) AS n_high,
        | bool_and(value >= 0) AS all_nonneg,
        | bool_or(value > 9.5) AS any_big
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_stats" ->
      """SELECT o_orderpriority,
        | round(stddev_samp(o_totalprice), 2) AS sd,
        | round(corr(o_totalprice, o_custkey), 4) AS cr,
        | round(avg(o_totalprice), 4) AS mean,
        | round(min(o_totalprice), 2) AS mn,
        | round(max(o_totalprice), 2) AS mx
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_percentile" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 4) AS p75
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_bitmap_uv" ->
      """SELECT event_type, count(DISTINCT user_id) AS uv_bitmap
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_udaf_typed" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_collect_state" ->
      """SELECT user_id,
        | string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        | count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_hist" ->
      """SELECT o_orderpriority, bucket, bucket * 50000 AS lo,
        | (bucket + 1) * 50000 AS hi, count(*) AS n
        |FROM (SELECT o_orderpriority,
        |        CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket
        |      FROM orders)
        |GROUP BY o_orderpriority, bucket
        |ORDER BY o_orderpriority, bucket""".stripMargin,
    "agg_mode" ->
      """WITH cnt AS (SELECT user_id, event_type, count(*) AS n
        |             FROM events GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type, n, row_number() OVER (
        |        PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
        |      FROM cnt)
        |SELECT user_id, event_type AS mode_type, n FROM r
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "agg_listagg" ->
      """SELECT user_id,
        | string_agg(DISTINCT event_type, ',' ORDER BY event_type)
        |   AS types,
        | count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the unpivot as its portable UNION ALL form (byte-identical
    // semantics; DuckDB's UNPIVOT sugar would work too)
    "agg_unpivot" ->
      """WITH w AS (SELECT o_orderpriority,
        |  CAST(count(*) AS DOUBLE) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DOUBLE), 2) AS revenue,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / count(*), 2) AS avg_price
        | FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'n_orders' AS metric,
        |       n_orders AS value FROM w
        |UNION ALL SELECT o_orderpriority, 'revenue', revenue FROM w
        |UNION ALL SELECT o_orderpriority, 'avg_price', avg_price FROM w
        |ORDER BY o_orderpriority, metric""".stripMargin
  )
}
