package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Complex-event-processing patterns (Flink CEP / SQL MATCH_RECOGNIZE —
  * the reference genre's sequence-detection layer; "Flink实时数仓",
  * /root/reference/README.md:2).
  *
  * Complements the `stream_cep_*` keys (Streaming.scala), which cover
  * the FIRST-occurrence funnel (one row per user, begin→next→next).
  * These two cover the other half of the CEP surface: quantified
  * patterns over ALL occurrences (`A+ B` with greedy runs and AFTER
  * MATCH SKIP PAST LAST ROW — a user can match many times) and
  * per-event absence (`A notFollowedBy B within T` evaluated at every
  * A, not once per user).
  *
  * Flink expresses these as an NFA over per-key ordered streams; the
  * Spark-first re-expression is run-length encoding (gaps-and-islands)
  * plus `lead` over the run-level table — every shuffle is keyed on
  * user_id (the windows) or (user_id, run_id) (the run aggregate), the
  * run table is strictly smaller than the event table, and nothing
  * joins back to base rows, so the whole plan scales linearly with the
  * fact table and never funnels rows through one task. No NFA state is
  * needed because the supported patterns (greedy A+ B, absence-within-
  * interval) are exactly the ones run-adjacency can express.
  */
object Cep {
  import Tables._

  /** 24 h in microseconds — the absence-pattern timeout. */
  private val timeoutUs = 86400000000L

  /** The gaps-and-islands run table every quantified pattern key
    * builds on: one row per maximal same-symbol run per user, with
    * (sym, n, run_start_us, run_total, first_value). Every window
    * shares ONE (user_id, ts_us, event_id) ordering — ordering the
    * lag/sum windows by the derived rn would force a second
    * per-partition sort Catalyst can't prove away. */
  private def runTable(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val running = byUser
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), ep(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(byUser))
      // gaps-and-islands: a run boundary wherever the symbol changes
      .withColumn("nr",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("nr")).over(running))
      .groupBy("user_id", "run_id")
      .agg(min(col("event_type")).as("sym"), // constant within a run
        count(lit(1)).as("n"),
        min(col("ts_us")).as("run_start_us"),
        dsum(col("value")).as("run_total"),
        min_by(col("value"), col("rn")).as("first_value"))
  }

  val queries: Map[String, Q] = Map(
    // MATCH_RECOGNIZE PATTERN (V+ P) per user, greedy, AFTER MATCH SKIP
    // PAST LAST ROW: a maximal run of consecutive 'view' events
    // immediately followed (in the user's event sequence) by a
    // 'purchase'. Greediness and non-overlap both fall out of run
    // maximality: a view-run is consumed whole, and the next candidate
    // starts after the purchase run. Measures: run length, view-value
    // total, first purchase value.
    "cep_pattern_match" -> ((s, d) => {
      // adjacency via lead over the (already reduced) run table — no
      // self-join, the run subtree evaluates once
      val byRun = Window.partitionBy("user_id").orderBy("run_id")
      runTable(s, d)
        .withColumn("next_sym", lead(col("sym"), 1).over(byRun))
        .withColumn("next_start_us", lead(col("run_start_us"), 1).over(byRun))
        .withColumn("next_first_value", lead(col("first_value"), 1).over(byRun))
        .where(col("sym") === "view" && col("next_sym") === "purchase")
        .select(col("user_id"), col("run_start_us").as("start_us"),
          col("next_start_us").as("end_us"), col("n").as("n_views"),
          col("run_total").as("views_total"),
          round(col("next_first_value"), 2).as("purchase_value"))
        // run starts can collide at microsecond ties: order by every
        // output column for a deterministic sequence
        .orderBy("user_id", "start_us", "end_us", "n_views", "views_total",
          "purchase_value")
    }),

    // MATCH_RECOGNIZE PATTERN (V+ C? P) per user — the OPTIONAL
    // quantifier (Flink CEP `.optional()`), greedy, SKIP PAST LAST
    // ROW: a maximal view-run reaches its purchase either directly or
    // across exactly ONE intervening click (greedy C? consumes it).
    // Two consecutive clicks kill the match: after C? is spent the
    // NFA needs P and sees a click — and no later start inside the
    // click run can begin V+ — so on the run table the predicate is
    // next run is a purchase, OR a LENGTH-1 click run whose successor
    // is a purchase. Same 3-keyed-shuffle shape as cep_pattern_match,
    // one extra lead pair on the reduced run table.
    "cep_pattern_optional" -> ((s, d) => {
      val byRun = Window.partitionBy("user_id").orderBy("run_id")
      runTable(s, d)
        .withColumn("s1", lead(col("sym"), 1).over(byRun))
        .withColumn("n1", lead(col("n"), 1).over(byRun))
        .withColumn("t1", lead(col("run_start_us"), 1).over(byRun))
        .withColumn("v1", lead(col("first_value"), 1).over(byRun))
        .withColumn("s2", lead(col("sym"), 2).over(byRun))
        .withColumn("t2", lead(col("run_start_us"), 2).over(byRun))
        .withColumn("v2", lead(col("first_value"), 2).over(byRun))
        .where(col("sym") === "view" &&
          (col("s1") === "purchase" ||
            (col("s1") === "click" && col("n1") === 1 &&
              col("s2") === "purchase")))
        .select(col("user_id"), col("run_start_us").as("start_us"),
          when(col("s1") === "purchase", col("t1")).otherwise(col("t2"))
            .as("end_us"),
          col("n").as("n_views"),
          col("run_total").as("views_total"),
          (col("s1") === "click").as("via_click"),
          round(when(col("s1") === "purchase", col("v1"))
            .otherwise(col("v2")), 2).as("purchase_value"))
        .orderBy("user_id", "start_us", "end_us", "n_views", "views_total",
          "via_click", "purchase_value")
    }),

    // MATCH_RECOGNIZE PATTERN (V{2,4} P) per user — the BOUNDED GREEDY
    // quantifier (Flink CEP times(2,4)), extending the V+ matcher
    // above. Semantics derived from leftmost-earliest matching + AFTER
    // MATCH SKIP PAST LAST ROW: scanning a maximal view-run of length
    // n followed by a purchase, a start offset leaves (n - offset)
    // views before the purchase, and V{2,4} then P succeeds only when
    // that remainder is in [2,4] — so n < 2 never matches, n in [2,4]
    // matches the whole run, and n > 4 first succeeds at offset n-4,
    // consuming exactly the LAST 4 views (greediness caps the take at
    // 4; earlier starts fail because the 5th view is not a P). One
    // match per qualifying run, measures over the MATCHED tail only.
    // Plan shape: the same gaps-and-islands base as cep_pattern_match
    // plus a tail-rank derived from max(rn) over the (user, run)
    // window — that window's partitioning is exactly the groupBy key,
    // so the run aggregate reuses its exchange: still 3 keyed
    // shuffles, nothing data-scale in one task.
    "cep_pattern_times" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val running = byUser
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byRun = Window.partitionBy("user_id", "run_id")
      val tailLe4 = col("max_rn") - col("rn") < 4
      val runs = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), ep(col("ts")).as("ts_us"))
        .withColumn("rn", row_number().over(byUser))
        .withColumn("nr",
          when(lag(col("event_type"), 1).over(byUser).isNull ||
            lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("run_id", sum(col("nr")).over(running))
        .withColumn("max_rn", max(col("rn")).over(byRun))
        .groupBy("user_id", "run_id")
        .agg(min(col("event_type")).as("sym"), // constant within a run
          count(lit(1)).as("n"),
          min(col("ts_us")).as("run_start_us"),
          min(when(tailLe4, col("ts_us"))).as("m_start_us"),
          dsum(when(tailLe4, col("value"))).as("m_total"),
          min_by(col("value"), col("rn")).as("first_value"))
      val byRunSeq = Window.partitionBy("user_id").orderBy("run_id")
      runs
        .withColumn("next_sym", lead(col("sym"), 1).over(byRunSeq))
        .withColumn("next_start_us", lead(col("run_start_us"), 1).over(byRunSeq))
        .withColumn("next_first_value", lead(col("first_value"), 1).over(byRunSeq))
        .where(col("sym") === "view" && col("n") >= 2 &&
          col("next_sym") === "purchase")
        .select(col("user_id"), col("m_start_us").as("start_us"),
          col("next_start_us").as("end_us"),
          least(col("n"), lit(4L)).as("n_views"),
          col("m_total").as("views_total"),
          round(col("next_first_value"), 2).as("purchase_value"))
        .orderBy("user_id", "start_us", "end_us", "n_views", "views_total",
          "purchase_value")
    }),

    // Flink CEP notFollowedBy + within(24h) — the absence/timeout
    // pattern (abandoned-interest detection): 'click' events with NO
    // same-user 'purchase' in the open interval (t, t+24h). TIME
    // semantics throughout: the next-purchase lookup is a RANGE frame
    // on ts_us (a same-microsecond purchase never counts, regardless
    // of ingestion order), and a purchase at exactly t+24h does not
    // suppress — Flink prunes the partial match when elapsed >= window,
    // so the timeout fires first. The lookup is a running min over one
    // user-keyed window — never a per-event subquery or a range
    // self-join. Frame direction matters for scale: the tail frame
    // (1, unboundedFollowing) is an UnboundedFollowing frame that
    // Spark RE-AGGREGATES from scratch per row — O(n²) per user, a
    // hot-user (bot) partition with 10⁵ events does 10¹⁰ buffer adds.
    // Ordering ts_us DESC turns the same "min purchase strictly after
    // me" into a GROWING frame (unboundedPreceding, -1 ≡ RANGE 1
    // PRECEDING in desc order = values >= ts_us+1) that Spark
    // accumulates incrementally — O(n) per user, identical semantics
    // incl. the strict boundary (ts_us is integral micros, so +1 μs is
    // exactly "strictly later").
    "cep_absence_timeout" -> ((s, d) => {
      val strictlyLater = Window.partitionBy("user_id")
        .orderBy(col("ts_us").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          ep(col("ts")).as("ts_us"))
        .withColumn("next_purchase_us",
          min(when(col("event_type") === "purchase", col("ts_us")))
            .over(strictlyLater))
        .where(col("event_type") === "click" &&
          (col("next_purchase_us").isNull ||
            col("next_purchase_us") >= col("ts_us") + timeoutUs))
        .select(col("user_id"), col("event_id"), col("ts_us").as("click_us"))
        .orderBy("user_id", "click_us", "event_id")
    }),

    // Flink CEP notNext — the IMMEDIATE negation, the last standard
    // quantifier ("view NOT immediately followed by click": e.g. a
    // product impression that failed to draw the next action). TRUE
    // per-event Flink semantics: begin("V").notNext("C") matches EVERY
    // view whose immediately-next same-user event is not a click — a
    // view mid-run matches too (its successor is a view), and the last
    // event of a user's stream matches vacuously (no next event can be
    // a click). One lead() over the shared (user, ts, id) ordering —
    // a single user-keyed shuffle, O(n) per user, no run table and no
    // self-join; `followed_by` reports the successor symbol ('none' at
    // end-of-stream) so downstream can split the vacuous tail out.
    "cep_pattern_not_next" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          ep(col("ts")).as("ts_us"))
        .withColumn("next_sym", lead(col("event_type"), 1).over(byUser))
        .where(col("event_type") === "view" &&
          (col("next_sym").isNull || col("next_sym") =!= "click"))
        .select(col("user_id"), col("event_id"),
          col("ts_us").as("view_us"),
          coalesce(col("next_sym"), lit("none")).as("followed_by"))
        .orderBy("user_id", "view_us", "event_id")
    }),

    // Flink CEP followedBy + within(24h), per event — the NON-IMMEDIATE
    // sequence (any events may intervene, unlike the run-adjacent
    // pattern keys): every click whose next same-user purchase lands in
    // the open interval (t, t+24h), with the conversion gap. EXACT
    // complement of cep_absence_timeout (same window, same strict
    // boundaries — every click is in exactly one of the two outputs;
    // CepSpec pins the partition corpus-wide), and the same
    // scale-safe GROWING frame: one user-keyed desc window, O(n) per
    // user, never a range self-join.
    "cep_followed_within" -> ((s, d) => {
      val strictlyLater = Window.partitionBy("user_id")
        .orderBy(col("ts_us").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          ep(col("ts")).as("ts_us"))
        .withColumn("next_purchase_us",
          min(when(col("event_type") === "purchase", col("ts_us")))
            .over(strictlyLater))
        .where(col("event_type") === "click" &&
          col("next_purchase_us") < col("ts_us") + timeoutUs)
        .select(col("user_id"), col("event_id"),
          col("ts_us").as("click_us"), col("next_purchase_us"),
          (col("next_purchase_us") - col("ts_us")).as("gap_us"))
        .orderBy("user_id", "click_us", "event_id")
    }),

    // Flink CEP ITERATIVE CONDITION (`IterativeCondition` — the
    // where-clause that inspects the events already accepted into the
    // match): purchases oneOrMore, accepting while the match's running
    // value total stays ≤ 150, firing when a purchase tips it over.
    // Detects the first event of each consecutive-purchase run at which
    // the run's cumulative value EXCEEDS 150 — the fraud-burst /
    // spend-cap pattern. Re-expression: the same gaps-and-islands run
    // labels as `runTable` (kept at EVENT level — the condition needs
    // per-event running state, which is exactly what the NFA's
    // iterative context holds), a cumulative DECIMAL sum over the
    // (user, run) frame, and first-crossing selection by row_number
    // after the threshold filter. The cumulative sum accumulates in
    // exact DECIMAL(18,2), so its value — and therefore the crossing
    // POSITION — is independent of both engine and partition order
    // (a double running sum would differ: DuckDB window-sums via
    // segment tree, Spark left-to-right). Every window keys on
    // user_id or (user_id, run_id): O(n) per user, run-bounded state,
    // no self-join, nothing data-scale in one task.
    "cep_iterative_condition" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val running = byUser
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byRun = Window.partitionBy("user_id", "run_id")
        .orderBy(col("ts_us"), col("event_id"))
      val runFrame = byRun
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), ep(col("ts")).as("ts_us"))
        .withColumn("nr",
          when(lag(col("event_type"), 1).over(byUser).isNull ||
            lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("run_id", sum(col("nr")).over(running))
        .where(col("event_type") === "purchase")
        .withColumn("cum", sum(col("value").cast(dec)).over(runFrame))
        .withColumn("k", row_number().over(byRun))
        .withColumn("run_start_us", min(col("ts_us")).over(runFrame))
        .where(col("cum") > 150)
        .withColumn("rk", row_number().over(byRun))
        .where(col("rk") === 1)
        .select(col("user_id"), col("run_start_us"),
          col("ts_us").as("cross_us"), col("k").cast("long").as("n_events"),
          round(col("cum").cast("double"), 2).as("total"))
        .orderBy("user_id", "run_start_us", "cross_us", "n_events",
          "total")
    }),

    // Flink CEP UNTIL (`oneOrMore().until(stop)` — the loop-breaker
    // condition): `V+ until(value > 90) P`. The until-condition stops
    // the view loop WITHOUT consuming the triggering element, so after
    // a >90 view the NFA needs P and sees that view — dead; but a
    // fresh start strictly AFTER the last >90 view still matches. Net
    // batch semantics on a view-run followed by a purchase: the
    // matched segment is the run's SUFFIX after its last >90 view
    // (the whole run when none), non-empty. Re-expression: the
    // event-level run labels, one (user, run)-keyed window carrying
    // the last trigger timestamp to every row, and conditional
    // aggregates over the suffix — same 3-keyed-shuffle shape as the
    // other quantifier keys, no self-join, run-bounded state.
    "cep_pattern_until" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val running = byUser
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wholeRun = Window.partitionBy("user_id", "run_id")
      val inSuffix = col("last_high_us").isNull ||
        col("ts_us") > col("last_high_us")
      val byRun = Window.partitionBy("user_id").orderBy("run_id")
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), ep(col("ts")).as("ts_us"))
        .withColumn("rn", row_number().over(byUser))
        .withColumn("nr",
          when(lag(col("event_type"), 1).over(byUser).isNull ||
            lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("run_id", sum(col("nr")).over(running))
        .withColumn("last_high_us",
          max(when(col("value") > 90, col("ts_us"))).over(wholeRun))
        .groupBy("user_id", "run_id")
        .agg(min(col("event_type")).as("sym"),
          min(col("ts_us")).as("run_start_us"),
          min_by(col("value"), col("rn")).as("first_value"),
          count(when(inSuffix, 1)).as("n_suf"),
          dsum(when(inSuffix, col("value"))).as("suf_total"),
          min(when(inSuffix, col("ts_us"))).as("suf_start_us"))
        .withColumn("next_sym", lead(col("sym"), 1).over(byRun))
        .withColumn("next_start_us", lead(col("run_start_us"), 1).over(byRun))
        .withColumn("next_first_value",
          lead(col("first_value"), 1).over(byRun))
        .where(col("sym") === "view" && col("next_sym") === "purchase" &&
          col("n_suf") > 0)
        .select(col("user_id"), col("suf_start_us").as("start_us"),
          col("next_start_us").as("end_us"), col("n_suf").as("n_views"),
          col("suf_total").as("views_total"),
          round(col("next_first_value"), 2).as("purchase_value"))
        .orderBy("user_id", "start_us", "end_us", "n_views", "views_total",
          "purchase_value")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "cep_pattern_match" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS nr
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
        |g AS (
        |  SELECT *, sum(nr) OVER (PARTITION BY user_id ORDER BY rn) AS run_id
        |  FROM r),
        |runs AS (
        |  SELECT user_id, run_id, min(event_type) AS sym, count(*) AS n,
        |    min(ts_us) AS run_start_us,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS run_total,
        |    min_by(value, rn) AS first_value
        |  FROM g GROUP BY 1, 2),
        |m AS (
        |  SELECT user_id, run_start_us, sym, n, run_total,
        |    lead(sym) OVER w2 AS next_sym,
        |    lead(run_start_us) OVER w2 AS next_start_us,
        |    lead(first_value) OVER w2 AS next_first_value
        |  FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id))
        |SELECT user_id, run_start_us AS start_us, next_start_us AS end_us,
        |  n AS n_views, run_total AS views_total,
        |  round(next_first_value, 2) AS purchase_value
        |FROM m WHERE sym = 'view' AND next_sym = 'purchase'
        |ORDER BY user_id, start_us, end_us, n_views, views_total,
        |  purchase_value""".stripMargin,
    "cep_pattern_optional" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS nr
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
        |g AS (
        |  SELECT *, sum(nr) OVER (PARTITION BY user_id ORDER BY rn) AS run_id
        |  FROM r),
        |runs AS (
        |  SELECT user_id, run_id, min(event_type) AS sym, count(*) AS n,
        |    min(ts_us) AS run_start_us,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS run_total,
        |    min_by(value, rn) AS first_value
        |  FROM g GROUP BY 1, 2),
        |m AS (
        |  SELECT user_id, run_start_us, sym, n, run_total,
        |    lead(sym) OVER w2 AS s1, lead(n) OVER w2 AS n1,
        |    lead(run_start_us) OVER w2 AS t1,
        |    lead(first_value) OVER w2 AS v1,
        |    lead(sym, 2) OVER w2 AS s2,
        |    lead(run_start_us, 2) OVER w2 AS t2,
        |    lead(first_value, 2) OVER w2 AS v2
        |  FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id))
        |SELECT user_id, run_start_us AS start_us,
        |  CASE WHEN s1 = 'purchase' THEN t1 ELSE t2 END AS end_us,
        |  n AS n_views, run_total AS views_total,
        |  s1 = 'click' AS via_click,
        |  round(CASE WHEN s1 = 'purchase' THEN v1 ELSE v2 END, 2)
        |    AS purchase_value
        |FROM m WHERE sym = 'view' AND (s1 = 'purchase'
        |  OR (s1 = 'click' AND n1 = 1 AND s2 = 'purchase'))
        |ORDER BY user_id, start_us, end_us, n_views, views_total,
        |  via_click, purchase_value""".stripMargin,
    "cep_pattern_times" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS nr
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
        |g AS (
        |  SELECT *, sum(nr) OVER (PARTITION BY user_id ORDER BY rn) AS run_id
        |  FROM r),
        |g2 AS (
        |  SELECT *, max(rn) OVER (PARTITION BY user_id, run_id) AS max_rn
        |  FROM g),
        |runs AS (
        |  SELECT user_id, run_id, min(event_type) AS sym, count(*) AS n,
        |    min(ts_us) AS run_start_us,
        |    min(CASE WHEN max_rn - rn < 4 THEN ts_us END) AS m_start_us,
        |    round(CAST(sum(CASE WHEN max_rn - rn < 4
        |        THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
        |      AS m_total,
        |    min_by(value, rn) AS first_value
        |  FROM g2 GROUP BY 1, 2),
        |m AS (
        |  SELECT user_id, m_start_us, sym, n, m_total,
        |    lead(sym) OVER w2 AS next_sym,
        |    lead(run_start_us) OVER w2 AS next_start_us,
        |    lead(first_value) OVER w2 AS next_first_value
        |  FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id))
        |SELECT user_id, m_start_us AS start_us, next_start_us AS end_us,
        |  least(n, 4) AS n_views, m_total AS views_total,
        |  round(next_first_value, 2) AS purchase_value
        |FROM m WHERE sym = 'view' AND n >= 2 AND next_sym = 'purchase'
        |ORDER BY user_id, start_us, end_us, n_views, views_total,
        |  purchase_value""".stripMargin,
    "cep_absence_timeout" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |x AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN ts_us END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us
        |          RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
        |  FROM e)
        |SELECT user_id, event_id, ts_us AS click_us FROM x
        |WHERE event_type = 'click'
        |  AND (np IS NULL OR np >= ts_us + 86400000000::BIGINT)
        |ORDER BY user_id, click_us, event_id""".stripMargin,
    "cep_pattern_not_next" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_sym
        |  FROM events)
        |SELECT user_id, event_id, ts_us AS view_us,
        |  coalesce(next_sym, 'none') AS followed_by
        |FROM e
        |WHERE event_type = 'view'
        |  AND (next_sym IS NULL OR next_sym <> 'click')
        |ORDER BY user_id, view_us, event_id""".stripMargin,
    "cep_followed_within" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |x AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN ts_us END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us
        |          RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
        |  FROM e)
        |SELECT user_id, event_id, ts_us AS click_us,
        |  np AS next_purchase_us, np - ts_us AS gap_us
        |FROM x
        |WHERE event_type = 'click' AND np < ts_us + 86400000000::BIGINT
        |ORDER BY user_id, click_us, event_id""".stripMargin,
    "cep_iterative_condition" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        |  FROM events),
        |r AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0
        |       END nr FROM ev
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |ri AS (SELECT *, sum(nr) OVER (PARTITION BY user_id
        |         ORDER BY ts_us, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_id
        |       FROM r),
        |c AS (SELECT user_id, run_id, ts_us, event_id,
        |        sum(CAST(value AS DECIMAL(18,2))) OVER w2 AS cum,
        |        row_number() OVER w2 AS k,
        |        min(ts_us) OVER w2 AS run_start_us
        |      FROM ri WHERE event_type = 'purchase'
        |      WINDOW w2 AS (PARTITION BY user_id, run_id
        |        ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |x AS (SELECT *, row_number() OVER (PARTITION BY user_id, run_id
        |        ORDER BY ts_us, event_id) rk
        |      FROM c WHERE cum > 150)
        |SELECT user_id, run_start_us, ts_us AS cross_us, k AS n_events,
        |  round(CAST(cum AS DOUBLE), 2) AS total
        |FROM x WHERE rk = 1
        |ORDER BY user_id, run_start_us, cross_us, n_events, total""".stripMargin,
    "cep_pattern_until" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0
        |       END nr FROM ev
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |ri AS (SELECT *, sum(nr) OVER (PARTITION BY user_id
        |         ORDER BY ts_us, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run_id
        |       FROM r),
        |h AS (SELECT *, max(CASE WHEN value > 90 THEN ts_us END)
        |        OVER (PARTITION BY user_id, run_id) last_high_us
        |      FROM ri),
        |runs AS (SELECT user_id, run_id, min(event_type) sym,
        |    min(ts_us) run_start_us, min_by(value, rn) first_value,
        |    count(CASE WHEN last_high_us IS NULL OR ts_us > last_high_us
        |      THEN 1 END) n_suf,
        |    round(CAST(sum(CASE WHEN last_high_us IS NULL
        |        OR ts_us > last_high_us
        |      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
        |      suf_total,
        |    min(CASE WHEN last_high_us IS NULL OR ts_us > last_high_us
        |      THEN ts_us END) suf_start_us
        |  FROM h GROUP BY 1, 2),
        |a AS (SELECT *, lead(sym) OVER w3 next_sym,
        |        lead(run_start_us) OVER w3 next_start_us,
        |        lead(first_value) OVER w3 next_first_value
        |      FROM runs WINDOW w3 AS (PARTITION BY user_id ORDER BY run_id))
        |SELECT user_id, suf_start_us AS start_us, next_start_us AS end_us,
        |  n_suf AS n_views, suf_total AS views_total,
        |  round(next_first_value, 2) AS purchase_value
        |FROM a WHERE sym = 'view' AND next_sym = 'purchase' AND n_suf > 0
        |ORDER BY user_id, start_us, end_us, n_views, views_total,
        |  purchase_value""".stripMargin
  )
}
