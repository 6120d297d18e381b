package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — analytic window functions: Top-N / rank ladder /
  * lag-lead / running frames / first-last image.
  *
  * Flink anchors: Table Top-N (`ROW_NUMBER() ... WHERE rn<=N`), keyed
  * ValueState session stitching and running reduce.
  *
  * Scale notes: every window partitions on a real key (priority, flag,
  * user) so work distributes across executors — no `Window.orderBy`
  * without partitioning (which would funnel 100 TB through one task).
  * Orderings always include a unique tiebreaker for determinism.
  */
object Windows {
  import Tables._

  val queries: Map[String, Q] = Map(
    // The genre's signature ADS op: top-3 orders by price per priority.
    "win_rank_topn" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderpriority", "rn")
    }),

    // rank / dense_rank / ntile ladder (unique ordering => ntile stable).
    "win_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        // quartile in the sort: tied (price, okey, lineno) rows are output-
        // identical except for ntile position, so sorting by it keeps the
        // sequence deterministic across engines.
        .orderBy("l_returnflag", "rnk", "l_orderkey", "l_linenumber",
          "quartile")
    }),

    // Distribution functions: percent_rank / cume_dist ladder (unique
    // ordering via the orderkey tiebreaker => identical in both engines).
    "win_dist" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // Event-time RANGE frame (Flink OVER RANGE INTERVAL analog): per
    // event, the user's trailing-1h event count and value sum — a
    // time-interval frame, not a row-count frame, so ties and gaps in
    // event time are handled by the frame bound itself. Decimal-summed
    // money keeps the window sum order-independent.
    "win_time_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(ep(col("ts")))
        .rangeBetween(-3600L * 1000000, 0)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), ep(col("ts")).as("ts_us"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double"), 2).as("v_1h"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // Session stitching: seconds since the user's previous event.
    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          ep(col("ts")).as("ts_us"),
          (ep(col("ts")) - lag(ep(col("ts")), 1).over(w)).as("gap_us"),
          lead(col("event_id"), 1).over(w).as("next_event"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // Running totals: cumulative revenue by order date per priority,
    // both ROWS (unique order => deterministic) and RANGE (tie-inclusive).
    "win_running_frame" -> ((s, d) => {
      val rows = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val range = Window.partitionBy("o_orderpriority")
        .orderBy(ep(col("o_orderdate")))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          ep(col("o_orderdate")).as("o_date_us"),
          round(sum(col("o_totalprice").cast(dec)).over(rows).cast("double"), 2)
            .as("cum_rows"),
          round(sum(col("o_totalprice").cast(dec)).over(range).cast("double"), 2)
            .as("cum_range"))
        .orderBy("o_orderpriority", "o_date_us", "o_orderkey")
    }),

    // Gap-based sessionization as an ASSIGNMENT (stream_window_session
    // aggregates sessions; this labels every event with its user-session
    // ordinal — the DWD enrichment that runs before session rollups).
    // New session when >30 min since the user's previous event; the
    // ordinal is a running sum of new-session flags. Both windows
    // partition by user, ordering is epoch-µs + event_id in BOTH engines
    // (the raw ns timestamp would order sub-µs ties differently).
    "win_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(ep(col("ts")),
        col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = ep(col("ts")) - lag(ep(col("ts")), 1).over(w)
      t(s, d, "events")
        .withColumn("new_sess",
          when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L).otherwise(0L))
        .select(col("user_id"), col("event_id"), ep(col("ts")).as("ts_us"),
          sum(col("new_sess")).over(run).as("session_n"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // DYNAMIC-gap sessionization (Flink's SessionWindowTimeGapExtractor
    // / session_window with a per-row gap): the idle threshold that
    // keeps a session alive depends on the PREVIOUS event — a purchase
    // holds the session open for 1 h (checkout flows stall), anything
    // else for 30 min. Same single keyed window pass as the fixed-gap
    // form; only the boundary predicate consults lag(event_type). All
    // arithmetic in integral micros, so the oracle is exact.
    "win_session_dynamic" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(ep(col("ts")),
        col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = ep(col("ts")) - lag(ep(col("ts")), 1).over(w)
      val allowedUs = when(
        lag(col("event_type"), 1).over(w) === "purchase",
        lit(3600L * 1000000)).otherwise(lit(1800L * 1000000))
      t(s, d, "events")
        .withColumn("new_sess",
          when(gapUs.isNull || gapUs > allowedUs, 1L).otherwise(0L))
        .select(col("user_id"), col("event_id"), ep(col("ts")).as("ts_us"),
          sum(col("new_sess")).over(run).as("session_n"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // Share-of-total per group (the ADS "% of segment revenue" metric):
    // each order's fraction of its priority class's total. The
    // denominator accumulates in exact decimal over the partition so
    // the share is partition-order independent; one keyed window, no
    // self-join against a grouped total.
    "win_share_of_total" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
      val tot = sum(col("o_totalprice").cast(dec)).over(w).cast("double")
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(col("o_totalprice") / tot, 6).as("share"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // Latest/earliest status image per user via frame-to-end first/last.
    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), ep(col("ts")).as("ts_us"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // Time-series RESAMPLE + GAP-FILL (the SAMPLE BY / LOCF shape every
    // TSDB ships): hourly purchase revenue on a complete hour spine
    // (sequence-explode between min and max), missing hours carried
    // forward from the last observed value. The one unpartitioned
    // window here runs over the SPINE, whose cardinality is calendar
    // hours — bounded by wall-clock time, not data volume — so it never
    // funnels data-scale rows through one task; the 100 TB work is all
    // in the hour-keyed partial aggregation below it.
    "win_gapfill" -> ((s, d) => {
      // the hourly aggregate feeds both the spine bounds and the join —
      // scan the fact table once (OpCache-tracked; callers release)
      val hourly = OpCache.track(t(s, d, "events")
        .where(col("event_type") === "purchase")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("revenue")))
      val spine = hourly
        .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
        .select(explode(
          sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour"))
      val w = Window.partitionBy(lit(0)).orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // lerp fill (the TSDB genre's other fill mode): gaps interpolate
      // linearly between the nearest known hours on both sides, via one
      // extra forward-looking pass over the same calendar-bounded spine.
      // The spine's endpoints always hold data (lo/hi come from the
      // aggregate), so interior gaps have both neighbors; the
      // trailing-gap LOCF arm makes the expression total anyway.
      val wf = Window.partitionBy(lit(0)).orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(hourly, Seq("hour"), "left")
        .withColumn("pos", ep(col("hour")))
        .withColumn("pv", last(col("revenue"), ignoreNulls = true).over(w))
        .withColumn("ppos", last(when(col("revenue").isNotNull, col("pos")),
          ignoreNulls = true).over(w))
        .withColumn("nv", first(col("revenue"), ignoreNulls = true).over(wf))
        .withColumn("npos", first(when(col("revenue").isNotNull, col("pos")),
          ignoreNulls = true).over(wf))
        .select(col("hour"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("revenue"),
          col("pv").as("revenue_filled"),
          // the 4-dp lerp is EXACT integer arithmetic (the avg_logp
          // lesson): anchors are 2-dp money -> exact cent longs, spine
          // positions are whole hours, so the interpolant is the
          // rational N/(100 L) and its half-away-from-zero 4-dp
          // rounding is (200 N + L) div (2 L) on nonneg longs —
          // engine-independent, no double-round boundary anywhere
          when(col("revenue").isNotNull, col("revenue"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(expr(
              "CAST(((CAST(ROUND(pv * 100) AS BIGINT)" +
                " * ((npos - pos) DIV 3600000000)" +
                " + CAST(ROUND(nv * 100) AS BIGINT)" +
                " * ((pos - ppos) DIV 3600000000)) * 200" +
                " + (npos - ppos) DIV 3600000000)" +
                " DIV (2 * ((npos - ppos) DIV 3600000000))" +
                " AS DOUBLE) / 10000.0"))
            .as("revenue_lerp"),
          col("revenue").isNull.as("is_gap"))
        .select(date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
          col("n_events"), col("revenue"), col("revenue_filled"),
          col("revenue_lerp"), col("is_gap"))
        .orderBy("hour")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "win_rank_topn" ->
      """SELECT o_orderpriority, rn, o_orderkey, round(o_totalprice,2) AS o_totalprice
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "win_rank_dense" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        | CAST(rank() OVER w AS INT) AS rnk,
        | CAST(dense_rank() OVER w AS INT) AS drnk,
        | CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber, quartile""".stripMargin,
    "win_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "win_time_range" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        | count(*) OVER w AS n_1h,
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
        |   AS v_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        | epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        | lead(event_id, 1) OVER w AS next_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "win_running_frame" ->
      """SELECT o_orderpriority, o_orderkey, epoch_us(o_orderdate) AS o_date_us,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS cum_rows,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_orderpriority ORDER BY epoch_us(o_orderdate)
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS cum_range
        |FROM orders
        |ORDER BY o_orderpriority, o_date_us, o_orderkey""".stripMargin,
    "win_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |    IS DISTINCT FROM NULL
        |   AND epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |    <= 1800000000 THEN 0 ELSE 1 END AS new_sess
        | FROM events)
        |SELECT user_id, event_id, ts_us,
        | CAST(sum(new_sess) OVER (PARTITION BY user_id
        |   ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS session_n
        |FROM g ORDER BY user_id, ts_us, event_id""".stripMargin,
    "win_session_dynamic" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        |  lag(event_type, 1) OVER w AS prev_type
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |g AS (SELECT user_id, event_id, ts_us,
        |  CASE WHEN gap_us IS NULL OR gap_us >
        |    (CASE WHEN prev_type = 'purchase' THEN 3600000000
        |          ELSE 1800000000 END)
        |   THEN 1 ELSE 0 END AS new_sess
        | FROM l)
        |SELECT user_id, event_id, ts_us,
        | CAST(sum(new_sess) OVER (PARTITION BY user_id
        |   ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS session_n
        |FROM g ORDER BY user_id, ts_us, event_id""".stripMargin,
    "win_share_of_total" ->
      """SELECT o_orderpriority, o_orderkey,
        | round(o_totalprice, 2) AS price,
        | round(o_totalprice / CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6) AS share
        |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "win_first_last" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        | first_value(event_type) OVER w AS first_type,
        | last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "win_gapfill" ->
      """WITH h AS (SELECT date_trunc('hour', ts) hr, count(*) n_events,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      revenue
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |b AS (SELECT min(hr) lo, max(hr) hi FROM h),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |            hr FROM b),
        |g AS (SELECT s.hr, coalesce(h.n_events, 0) n_events, h.revenue,
        |    epoch_us(s.hr) pos,
        |    last_value(h.revenue IGNORE NULLS) OVER wb revenue_filled,
        |    last_value(CASE WHEN h.revenue IS NOT NULL
        |      THEN epoch_us(s.hr) END IGNORE NULLS) OVER wb ppos,
        |    first_value(h.revenue IGNORE NULLS) OVER wf nv,
        |    first_value(CASE WHEN h.revenue IS NOT NULL
        |      THEN epoch_us(s.hr) END IGNORE NULLS) OVER wf npos,
        |    h.revenue IS NULL is_gap
        |  FROM spine s LEFT JOIN h ON s.hr = h.hr
        |  WINDOW wb AS (ORDER BY s.hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (ORDER BY s.hr
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT strftime(hr, '%Y-%m-%d %H:00') AS "hour", n_events,
        |  revenue, revenue_filled,
        |  CASE WHEN revenue IS NOT NULL THEN revenue
        |       WHEN nv IS NULL THEN revenue_filled
        |       ELSE CAST(((CAST(round(revenue_filled * 100) AS BIGINT)
        |           * ((npos - pos) // 3600000000)
        |           + CAST(round(nv * 100) AS BIGINT)
        |           * ((pos - ppos) // 3600000000)) * 200
        |           + (npos - ppos) // 3600000000)
        |         // (2 * ((npos - ppos) // 3600000000))
        |         AS DOUBLE) / 10000.0 END revenue_lerp,
        |  is_gap
        |FROM g ORDER BY 1""".stripMargin
  )
}
