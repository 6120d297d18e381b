package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ADS-layer warehouse metrics (the reference genre's end products —
  * "Flink实时数仓", /root/reference/README.md:2 — is a DWS/ADS metric
  * pipeline: retention, GMV boards, activity rollups).
  *
  * Scale notes: both metrics aggregate the fact table down to per-day
  * cardinality FIRST (one keyed shuffle over (user, day) or (day)); the
  * only constant-key window runs over the REDUCED per-day table (≤365
  * rows/year at any corpus size), the same provably-reduced exception
  * `stream_watermark_late` uses — base-table rows never funnel through
  * one task.
  */
object Ads {
  import Tables._

  val queries: Map[String, Q] = Map(
    // Next-day retention per day: of the users active on day D, the
    // fraction also active on D+1 (the genre's DAU-retention board).
    // distinct (user, day) first — one shuffle — then a self-equi-join
    // shifted by one day; both sides are the reduced activity table.
    "ads_retention_daily" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val base = act.groupBy("day").agg(count(lit(1)).as("dau"))
      // a user active on day X counts as retained for day X-1
      val ret = act.join(
          act.select(col("user_id"), date_sub(col("day"), 1).as("day")),
          Seq("user_id", "day"))
        .groupBy("day").agg(count(lit(1)).as("retained"))
      base.join(ret, Seq("day"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          round(coalesce(col("retained"), lit(0L)).cast("double") /
            col("dau"), 4).as("retention"))
        .orderBy("day")
    }),

    // Daily GMV + running cumulative GMV (the genre's revenue board).
    // Money accumulates in exact DECIMAL(18,2) both per-day and through
    // the cumulative window, so partition order can't change a cent;
    // the cumulative window's constant key runs over the per-day table
    // (reduced: one row per day).
    "ads_gmv_cumulative" -> ((s, d) => {
      val daily = t(s, d, "events")
        .where(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(dec)).as("gmv_d"),
          count(lit(1)).as("n_purchases"))
      val w = Window.partitionBy(lit(0)).orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("gmv_d").cast("double").as("gmv"),
          sum(col("gmv_d")).over(w).cast("double").as("cum_gmv"),
          col("n_purchases"))
        .orderBy("day")
    }),

    // 7-day rolling active users (the genre's WAU board). The fact table
    // reduces to distinct (user, day) in ONE keyed shuffle;
    // count(DISTINCT) over a sliding window isn't decomposable into a
    // running frame, so each activity day EXPLODES map-side into the ≤7
    // windows it contributes to, keeps only observed window days via a
    // broadcast EQUI semi-join (a range-predicate nested loop against
    // the day list would evaluate |act|×|days| pairs — this shape is
    // |act|×7 rows and never nested-loops), and re-aggregates.
    "ads_wau_rolling" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val days = act.select(col("day").as("w_day")).distinct()
      act.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("w_day"))
        .join(broadcast(days), Seq("w_day"), "left_semi")
        .groupBy("w_day")
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(date_format(col("w_day"), "yyyy-MM-dd").as("day"), col("wau"))
        .orderBy("day")
    }),

    // Conversion-funnel board (ClickHouse windowFunnel / Flink CEP
    // aggregate analog): per user, the first view, the first click after
    // that view, and the first purchase after that click — all within
    // 72 h of the view — then how many users reach each step. Three
    // keyed min-aggregations plus equi-joins on user_id (never a
    // per-user event-history collect), and the step counts are 1-row
    // aggregates unpivoted via stack() — nothing here funnels base-table
    // rows through one task at any corpus size.
    "ads_funnel_steps" -> ((s, d) => {
      val winUs = 72L * 3600 * 1000000
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), ep(col("ts")).as("ts_us"))
      // each stage feeds both the next stage's join and its own 1-row
      // count — cache them (OpCache-tracked, lazy) so the events table
      // is scanned once per stage instead of ~6x for three counts
      val v = OpCache.track(ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("v_us")))
      val c = OpCache.track(ev.where(col("event_type") === "click")
        .join(v, "user_id")
        .where(col("ts_us") > col("v_us") &&
          col("ts_us") <= col("v_us") + winUs)
        // v_us is single-valued per user after the equi-join; min() just
        // carries it through the aggregate
        .groupBy("user_id").agg(min(col("ts_us")).as("c_us"),
          min(col("v_us")).as("v_us")))
      val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
        .where(col("ts_us") > col("c_us") &&
          col("ts_us") <= col("v_us") + winUs)
        .groupBy("user_id").agg(min(col("ts_us")).as("p_us"))
      v.agg(count(lit(1)).as("s1"))
        .crossJoin(c.agg(count(lit(1)).as("s2")))
        .crossJoin(p.agg(count(lit(1)).as("s3")))
        .selectExpr("stack(3, 1, s1, 2, s2, 3, s3) as (step, users)")
        .orderBy("step")
    }),

    // Weekly COHORT RETENTION MATRIX (the growth team's heatmap): users
    // grouped by first-activity week, each later week's actives as a
    // fraction of the cohort. The fact table reduces to distinct
    // (user, week) in one keyed shuffle; the cohort label is a per-user
    // min joined back on user_id (co-partitioned with the distinct's
    // shuffle at scale); the matrix itself is |weeks|² rows — tiny at
    // any corpus size. date_trunc('week') is Monday-start on both
    // engines.
    "ads_cohort_matrix" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val cohort = act.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      val sizes = cohort.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_size"))
      act.join(cohort, "user_id")
        .groupBy("cohort_wk", "wk").agg(count(lit(1)).as("active_users"))
        .join(sizes, "cohort_wk")
        .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("int")
            .as("week_offset"),
          col("active_users"), col("cohort_size"),
          round(col("active_users").cast("double") / col("cohort_size"), 4)
            .as("retention"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Multi-touch purchase ATTRIBUTION (the marketing board every
    // realtime DW ships): each purchase's value is credited to the
    // same user's clicks in the 72 h before it — fully to the LAST
    // touch, and split evenly across all touches (LINEAR) — then
    // rolled up by touch day. The purchases⋈clicks join is TIME-
    // BUCKETED exactly like `join_interval_bucketed` (Joins.scala):
    // bucket width = the 72 h window Δ, purchases explode into their
    // own and the PREVIOUS bucket (a click at c_us < p_us within Δ
    // sits in floor(p_us/Δ) or floor(p_us/Δ)-1), clicks key on their
    // own bucket — so the equi key is (user_id, bucket) and a hot
    // user's (bot's) per-key fan-in is bounded by its clicks per
    // 72 h window, not its clicks-ever. A pair meets in exactly ONE
    // bucket (the click's own), so no post-join dedup. Downstream:
    // two windows keyed by purchase id — never data-scale rows in
    // one partition. Linear shares are divisions, so each share rounds
    // to 6 dp and accumulates in DECIMAL(28,6) (order-independent to
    // the cent on both engines); last-touch credits are exact money.
    "ads_attribution" -> ((s, d) => {
      val winUs = 72L * 3600 * 1000000
      val ev = t(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          ep(col("ts")).as("c_us"), to_date(col("ts")).as("c_day"),
          floor(ep(col("ts")) / winUs).as("bkt"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          ep(col("ts")).as("p_us"), col("value").as("p_val"),
          explode(array(floor(ep(col("ts")) / winUs) - 1,
            floor(ep(col("ts")) / winUs))).as("bkt"))
      val wCnt = Window.partitionBy("p_id")
      val wLast = Window.partitionBy("p_id")
        .orderBy(col("c_us").desc, col("click_id").desc)
      purch.join(clicks, Seq("user_id", "bkt"))
        .where(col("c_us") < col("p_us") &&
          col("c_us") >= col("p_us") - winUs)
        .withColumn("n_touch", count(lit(1)).over(wCnt))
        .withColumn("rk", row_number().over(wLast))
        .groupBy("c_day")
        .agg(
          dsum(when(col("rk") === 1, col("p_val")).otherwise(lit(0.0)))
            .as("last_touch_rev"),
          dsum6(round(col("p_val") / col("n_touch"), 6)).as("linear_rev"),
          count(lit(1)).as("n_touches"))
        .select(date_format(col("c_day"), "yyyy-MM-dd").as("day"),
          col("last_touch_rev"), col("linear_rev"), col("n_touches"))
        .orderBy("day")
    }),

    // The SQL front door (the genre is Flink-SQL-first: ADS boards are
    // written as CTE queries over registered tables, not DataFrame
    // chains). One key exercises spark.sql() end-to-end — temp view +
    // ANSI CTE + the same exact-decimal money convention — proving a
    // Table-API user can drive this engine without touching the
    // DataFrame surface. The plan is identical Catalyst output to the
    // equivalent DataFrame chain, so every scale property carries over.
    "sql_ads_board" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("graft_sql_events")
      s.sql("""
        WITH purchases AS (
          SELECT date_trunc('hour', ts) AS h, user_id, value
          FROM graft_sql_events WHERE event_type = 'purchase')
        SELECT unix_micros(h) AS h_us,
               COUNT(*) AS n_purchases,
               COUNT(DISTINCT user_id) AS buyers,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS revenue
        FROM purchases GROUP BY h ORDER BY h_us""")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ads_attribution" ->
      """WITH clicks AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us,
        |         CAST(ts AS DATE) AS c_day
        |  FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us,
        |         value AS p_val
        |  FROM events WHERE event_type = 'purchase'),
        |touches AS (
        |  SELECT p.p_id, p.p_val, c.c_day, c.c_us, c.click_id,
        |         count(*) OVER (PARTITION BY p.p_id) AS n_touch,
        |         row_number() OVER (PARTITION BY p.p_id
        |           ORDER BY c.c_us DESC, c.click_id DESC) AS rk
        |  FROM purch p JOIN clicks c USING (user_id)
        |  WHERE c.c_us < p.p_us
        |    AND c.c_us >= p.p_us - 259200000000::BIGINT)
        |SELECT strftime(c_day, '%Y-%m-%d') AS day,
        | round(CAST(sum(CASE WHEN rk = 1 THEN CAST(p_val AS DECIMAL(18,2))
        |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2)
        |   AS last_touch_rev,
        | round(CAST(sum(CAST(round(p_val / n_touch, 6) AS DECIMAL(28,6)))
        |   AS DOUBLE), 2) AS linear_rev,
        | count(*) AS n_touches
        |FROM touches GROUP BY c_day ORDER BY day""".stripMargin,
    "ads_retention_daily" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |             FROM events),
        |base AS (SELECT day, count(*) AS dau FROM act GROUP BY day),
        |ret AS (SELECT a.day, count(*) AS retained
        |        FROM act a JOIN act b
        |          ON a.user_id = b.user_id AND b.day = a.day + 1
        |        GROUP BY a.day)
        |SELECT strftime(base.day, '%Y-%m-%d') AS day, base.dau,
        | coalesce(ret.retained, 0) AS retained,
        | round(coalesce(ret.retained, 0)::DOUBLE / base.dau, 4) AS retention
        |FROM base LEFT JOIN ret ON base.day = ret.day
        |ORDER BY 1""".stripMargin,
    "ads_gmv_cumulative" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |  sum(CAST(value AS DECIMAL(18,2))) AS gmv_d,
        |  count(*) AS n_purchases
        | FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        | CAST(gmv_d AS DOUBLE) AS gmv,
        | CAST(sum(gmv_d) OVER (ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS cum_gmv,
        | n_purchases
        |FROM daily ORDER BY 1""".stripMargin,
    "ads_wau_rolling" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |             FROM events),
        |days AS (SELECT DISTINCT day AS w_day FROM act)
        |SELECT strftime(d.w_day, '%Y-%m-%d') AS day,
        | count(DISTINCT a.user_id) AS wau
        |FROM days d JOIN act a ON a.day BETWEEN d.w_day - 6 AND d.w_day
        |GROUP BY d.w_day ORDER BY 1""".stripMargin,
    "ads_funnel_steps" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) ts_us
        |            FROM events),
        |v AS (SELECT user_id, min(ts_us) v_us FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) c_us, min(v.v_us) v_us
        |      FROM ev e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts_us > v.v_us
        |        AND e.ts_us <= v.v_us + 259200000000
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_us) p_us
        |      FROM ev e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.c_us
        |        AND e.ts_us <= c.v_us + 259200000000
        |      GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step, (SELECT count(*) FROM v) AS users
        |UNION ALL SELECT 2, (SELECT count(*) FROM c)
        |UNION ALL SELECT 3, (SELECT count(*) FROM p)
        |ORDER BY step""".stripMargin,
    "ads_cohort_matrix" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |               date_trunc('week', ts)::DATE wk FROM events),
        |coh AS (SELECT user_id, min(wk) cohort_wk FROM act GROUP BY 1),
        |sizes AS (SELECT cohort_wk, count(*) cohort_size FROM coh
        |          GROUP BY 1),
        |m AS (SELECT c.cohort_wk, a.wk, count(*) active_users
        |      FROM act a JOIN coh c USING (user_id) GROUP BY 1, 2)
        |SELECT strftime(m.cohort_wk, '%Y-%m-%d') AS cohort_week,
        | CAST(date_diff('day', m.cohort_wk, m.wk) / 7 AS INT)
        |   AS week_offset,
        | m.active_users, s.cohort_size,
        | round(m.active_users::DOUBLE / s.cohort_size, 4) AS retention
        |FROM m JOIN sizes s USING (cohort_wk)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "sql_ads_board" ->
      """WITH purchases AS (
        |  SELECT date_trunc('hour', ts) AS h, user_id, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT epoch_us(h) AS h_us, count(*) AS n_purchases,
        | count(DISTINCT user_id) AS buyers,
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |   AS revenue
        |FROM purchases GROUP BY h ORDER BY h_us""".stripMargin
  )
}
