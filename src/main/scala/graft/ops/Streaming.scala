package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 — streaming-native operators, batch-verifiable forms.
  *
  * This is the reference's identity ("Flink实时数仓",
  * /root/reference/README.md:2): event-time windows, watermark lateness,
  * keyed state machines, CEP funnels, upsert-latest images. The DuckDB
  * oracle is batch-only, so each key computes the *final converged* result
  * the streaming form would emit; the real `readStream` wrappers sharing
  * these column expressions live in `graft.streaming`.
  *
  * Scale notes: every op partitions by a key; `stream_watermark_late`'s
  * arrival-order prefix scan is two-level (parallel per-chunk maxima,
  * one-task prefix only over the n/4096-row chunk table, broadcast
  * back) — no unpartitioned window ever sees base-table cardinality
  * (a real stream gets the watermark from the engine for free — see
  * `graft.streaming`); sessionization is the
  * lag+cumsum formulation (one shuffle by user, O(n log n) per
  * partition); the CEP funnel is three keyed min-aggregations, not a
  * per-user collect_list of unbounded history.
  */
object Streaming {
  import Tables._

  val queries: Map[String, Q] = Map(
    // Tumbling 1h event-time windows per type (TumblingEventTimeWindows).
    "stream_window_tumbling" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("w_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(ep(col("w_start")).as("w_start_us"), col("event_type"),
          col("n"), col("total"))
        .orderBy("w_start_us", "event_type")),

    // Sliding 1h/15m windows (SlidingEventTimeWindows): each event lands
    // in 4 overlapping windows.
    "stream_window_sliding" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes")
          .getField("start").as("w_start"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(ep(col("w_start")).as("w_start_us"), col("n"), col("total"))
        .orderBy("w_start_us")),

    // Flink's CUMULATE window TVF (progressive early results): within
    // each 1-hour span, the cumulative count/sum at every 15-min mark.
    // An event at t contributes to every mark AFTER t in its span — a
    // map-side explode into ≤4 (span, mark) keys and ONE keyed shuffle
    // (the WAU-rolling shape); output stays |hours|×4 rows at any event
    // volume. Streaming form: Streams.cumulateCounts (same expressions,
    // parity-tested).
    "stream_window_cumulate" -> ((s, d) =>
      t(s, d, "events")
        .select(ep(col("ts")).as("ts_us"), col("value"))
        .select((col("ts_us") - pmod(col("ts_us"), lit(3600000000L)))
          .as("w_start_us"), col("ts_us"), col("value"))
        .select(col("w_start_us"), col("ts_us"), col("value"),
          explode(sequence(lit(1), lit(4))).as("k"))
        .where(col("w_start_us") + col("k") * 900000000L > col("ts_us"))
        .groupBy(col("w_start_us"),
          (col("w_start_us") + col("k") * 900000000L).as("w_end_us"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("w_start_us", "w_end_us")),

    // Windowed Top-N (the genre's per-window ranking ADS op): top-2 event
    // types by count within each hourly tumbling window.
    "stream_topn_windowed" -> ((s, d) => {
      val w = Window.partitionBy("w_start_us")
        .orderBy(col("n").desc, col("event_type"))
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("w_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(ep(col("w_start")).as("w_start_us"), col("event_type"), col("n"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .orderBy("w_start_us", "rk")
    }),

    // Session windows per user, 30-min gap (EventTimeSessionWindows):
    // lag + cumulative-sum session ids — exact and oracle-able.
    "stream_window_session" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("gap_us", ep(col("ts")) - lag(ep(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(ep(min(col("ts"))).as("sess_start_us"),
          ep(max(col("ts"))).as("sess_end_us"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "sess_id")
    }),

    // Watermark late-data policy: with arrival order = event_id, a row is
    // dropped when the watermark (running max event time - 10 min over
    // prior arrivals) has already passed its timestamp.
    //
    // The running max is a TWO-LEVEL prefix scan, not a global
    // unpartitioned window (which would funnel every row through one
    // task): level 1 computes per-chunk maxima in parallel (chunk =
    // event_id div N); level 2 prefix-maxes the REDUCED chunk table —
    // its one-task window touches only n/N rows (~10^6 at 100 TB with
    // N=2^20, vs 10^12 events) — and broadcasts back; rows then
    // classify in parallel inside chunk-partitioned windows.
    "stream_watermark_late" -> ((s, d) => {
      val chunk = 4096
      val ev = t(s, d, "events")
        .select(col("event_id"), ep(col("ts")).as("ts_us"),
          expr(s"event_id div $chunk").as("ck"))
      val wCk = Window.partitionBy(lit(0)).orderBy("ck")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = ev.groupBy("ck").agg(max(col("ts_us")).as("cmax"))
        .withColumn("prev_max", max(col("cmax")).over(wCk))
        .select(col("ck"), col("prev_max"))
      val wIntra = Window.partitionBy("ck").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.join(broadcast(prefix), "ck")
        .withColumn("wm_us",
          greatest(max(col("ts_us")).over(wIntra), col("prev_max"))
            - 10L * 60 * 1000000)
        .select(col("event_id"), col("ts_us"),
          when(col("wm_us").isNotNull && col("ts_us") < col("wm_us"), 1)
            .otherwise(0).as("is_late"))
        .orderBy("event_id")
    }),

    // Keyed state machine (KeyedProcessFunction + ValueState): first-visit
    // flag -> new-vs-returning per event. Batch form: rank-1 comparison.
    "stream_stateful_counter" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("visit_no", row_number().over(w))
        .select(col("event_id"), col("user_id"),
          when(col("visit_no") === 1, "new").otherwise("returning")
            .as("visit_kind"),
          col("visit_no"))
        .orderBy("event_id")
    }),

    // CEP funnel (flink-cep): first view -> first click after it -> first
    // purchase after that, per user. Three keyed min-aggregations — no
    // unbounded per-user history collection.
    "stream_cep_pattern" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), ep(col("ts")).as("ts_us"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("view_us"))
      val c = ev.where(col("event_type") === "click").as("c")
        .join(v, "user_id")
        .where(col("ts_us") > col("view_us"))
        .groupBy("user_id", "view_us").agg(min(col("ts_us")).as("click_us"))
      val p = ev.where(col("event_type") === "purchase").as("p")
        .join(c, "user_id")
        .where(col("ts_us") > col("click_us"))
        .groupBy("user_id", "view_us", "click_us")
        .agg(min(col("ts_us")).as("purchase_us"))
      p.select(col("user_id"), col("view_us"), col("click_us"),
          col("purchase_us"))
        .orderBy("user_id")
    }),

    // CEP funnel with within(72h) + timeout side output (flink-cep's
    // `within(Time)` + timed-out-partial-match handler — the
    // abandoned-funnel half of why the genre uses CEP). Every user who
    // STARTED the pattern emits exactly one row: 'complete' if the
    // purchase landed within 72h of the first view, else 'timeout' with
    // the stage reached (1 = view only, 2 = view+click). Same three
    // keyed min-aggregations as stream_cep_pattern, bounded by the
    // deadline; the timed-out rows are the left-join remainder. The
    // incremental form is `graft.streaming.Streams.cepFunnelWithin`
    // (event-time timer = the deadline, fired by the watermark).
    "stream_cep_timeout" -> ((s, d) => {
      val withinUs = 72L * 3600 * 1000000 // within(72 hours)
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), ep(col("ts")).as("ts_us"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("view_us"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id")
        .where(col("ts_us") > col("view_us") &&
          col("ts_us") <= col("view_us") + withinUs)
        .groupBy("user_id", "view_us").agg(min(col("ts_us")).as("click_us"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id")
        .where(col("ts_us") > col("click_us") &&
          col("ts_us") <= col("view_us") + withinUs)
        .groupBy("user_id", "view_us", "click_us")
        .agg(min(col("ts_us")).as("purchase_us"))
      v.join(c, Seq("user_id", "view_us"), "left")
        .join(p, Seq("user_id", "view_us", "click_us"), "left")
        .select(col("user_id"),
          when(col("purchase_us").isNotNull, "complete").otherwise("timeout")
            .as("status"),
          when(col("purchase_us").isNotNull, 3)
            .when(col("click_us").isNotNull, 2).otherwise(1).as("stage"),
          col("view_us"),
          coalesce(col("click_us"), lit(-1L)).as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
        .orderBy("user_id")
    }),

    // Keyed first-arrival dedup (the genre's exactly-once ingest guard:
    // Flink's keyed ValueState<Boolean> / state-TTL dedup). Keeps the
    // first event per (user_id, event_type) in arrival (event_id) order;
    // one keyed shuffle + sort, never a global one. The incremental form
    // is `graft.streaming.Streams.dedupKeys`
    // (dropDuplicatesWithinWatermark — watermark-bounded dedup state),
    // parity-tested in StreamingParitySpec.
    "stream_dedup_keys" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("event_id")
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          ep(col("ts")).as("ts_us"))
        .orderBy("user_id", "event_type")
    }),

    // Upsert materialization: latest image per key (upsert-kafka analog).
    "stream_upsert_latest" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          ep(col("ts")).as("ts_us"), round(col("value"), 2).as("value"))
        .orderBy("user_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "stream_window_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
        | count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin,
    "stream_window_sliding" ->
      """SELECT epoch_us(to_timestamp(slide_start)) AS w_start_us, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM (SELECT value,
        |        CAST(floor(epoch(ts)/900)*900 AS BIGINT) - 900*k.k AS slide_start
        |      FROM events, (SELECT unnest([0,1,2,3]) AS k) k
        |      WHERE CAST(floor(epoch(ts)/900)*900 AS BIGINT) - 900*k.k + 3600 > epoch(ts))
        |GROUP BY slide_start ORDER BY w_start_us""".stripMargin,
    "stream_window_cumulate" ->
      """SELECT w_start_us, w_start_us + 900000000::BIGINT * k.k AS w_end_us,
        | count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM (SELECT epoch_us(ts)
        |          - ((epoch_us(ts) % 3600000000 + 3600000000) % 3600000000)
        |          AS w_start_us,
        |        epoch_us(ts) AS ts_us, value FROM events) e,
        |     (SELECT unnest([1,2,3,4]) AS k) k
        |WHERE e.w_start_us + 900000000::BIGINT * k.k > e.ts_us
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_topn_windowed" ->
      """SELECT w_start_us, event_type, n, rk FROM (
        | SELECT w_start_us, event_type, n, CAST(row_number() OVER (
        |   PARTITION BY w_start_us ORDER BY n DESC, event_type) AS INT) AS rk
        | FROM (SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us,
        |         event_type, count(*) AS n
        |       FROM events GROUP BY 1, 2))
        |WHERE rk <= 2 ORDER BY w_start_us, rk""".stripMargin,
    "stream_window_session" ->
      """WITH g AS (
        | SELECT user_id, event_id, ts,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        | FROM events),
        |s AS (
        | SELECT user_id, event_id, ts,
        |  CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 30*60*1000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        | FROM g)
        |SELECT user_id, sess_id, epoch_us(min(ts)) AS sess_start_us,
        | epoch_us(max(ts)) AS sess_end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,
    "stream_watermark_late" ->
      """SELECT event_id, epoch_us(ts) AS ts_us,
        | CASE WHEN max(epoch_us(ts)) OVER (ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        - 10*60*1000000 > epoch_us(ts)
        |      THEN 1 ELSE 0 END AS is_late
        |FROM events ORDER BY event_id""".stripMargin,
    "stream_stateful_counter" ->
      """SELECT event_id, user_id,
        | CASE WHEN visit_no = 1 THEN 'new' ELSE 'returning' END AS visit_kind,
        | visit_no
        |FROM (SELECT event_id, user_id, CAST(row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS visit_no
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "stream_cep_pattern" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS view_us
        |           FROM events WHERE event_type='view' GROUP BY user_id),
        |c AS (SELECT e.user_id, v.view_us, min(epoch_us(e.ts)) AS click_us
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type='click' AND epoch_us(e.ts) > v.view_us
        |      GROUP BY e.user_id, v.view_us),
        |p AS (SELECT e.user_id, c.view_us, c.click_us,
        |        min(epoch_us(e.ts)) AS purchase_us
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type='purchase' AND epoch_us(e.ts) > c.click_us
        |      GROUP BY e.user_id, c.view_us, c.click_us)
        |SELECT user_id, view_us, click_us, purchase_us FROM p
        |ORDER BY user_id""".stripMargin,
    "stream_cep_timeout" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |           FROM events),
        |v AS (SELECT user_id, min(ts_us) AS view_us FROM e
        |      WHERE event_type='view' GROUP BY user_id),
        |c AS (SELECT e.user_id, v.view_us, min(e.ts_us) AS click_us
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type='click' AND e.ts_us > v.view_us
        |        AND e.ts_us <= v.view_us + 259200000000
        |      GROUP BY e.user_id, v.view_us),
        |p AS (SELECT e.user_id, c.view_us, c.click_us,
        |        min(e.ts_us) AS purchase_us
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type='purchase' AND e.ts_us > c.click_us
        |        AND e.ts_us <= c.view_us + 259200000000
        |      GROUP BY e.user_id, c.view_us, c.click_us)
        |SELECT v.user_id,
        | CASE WHEN p.purchase_us IS NOT NULL THEN 'complete'
        |      ELSE 'timeout' END AS status,
        | CAST(CASE WHEN p.purchase_us IS NOT NULL THEN 3
        |      WHEN c.click_us IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage,
        | v.view_us, coalesce(c.click_us, -1) AS click_us,
        | coalesce(p.purchase_us, -1) AS purchase_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id AND v.view_us = c.view_us
        |LEFT JOIN p ON c.user_id = p.user_id AND c.view_us = p.view_us
        |  AND c.click_us = p.click_us
        |ORDER BY 1""".stripMargin,
    "stream_upsert_latest" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        | round(value, 2) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "stream_dedup_keys" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY event_id) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin
  )
}
