package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CEP pattern semantics: greedy quantified runs (MATCH_RECOGNIZE
  * `V+ P`, all occurrences, skip past last row) and per-event absence
  * (`click notFollowedBy purchase within 24h`). */
class CepSpec extends AnyFunSuite {
  import TestSpark._

  /** Build a micro events corpus in a temp dir and run `f` on it. */
  private def withEvents(
      rows: Seq[(Long, String, Long, String, Double)])(f: String => Unit): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cep_spec").toString
    rows.map { case (id, ts, u, et, v) =>
      (id, java.sql.Timestamp.valueOf(ts), u, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("pattern V+ P: greedy maximal run, all occurrences, measures") {
    // user 1: V V P P V C P V  -> exactly ONE match: [V V] -> first P
    //   (second P has no preceding view run; V before C no; trailing V no)
    // user 2: V P V P          -> TWO matches (all occurrences, not first)
    val rows = Seq(
      (1L, "2025-01-01 00:01:00", 1L, "view", 10.0),
      (2L, "2025-01-01 00:02:00", 1L, "view", 20.0),
      (3L, "2025-01-01 00:03:00", 1L, "purchase", 99.0),
      (4L, "2025-01-01 00:04:00", 1L, "purchase", 88.0),
      (5L, "2025-01-01 00:05:00", 1L, "view", 30.0),
      (6L, "2025-01-01 00:06:00", 1L, "click", 0.0),
      (7L, "2025-01-01 00:07:00", 1L, "purchase", 77.0),
      (8L, "2025-01-01 00:08:00", 1L, "view", 40.0),
      (9L, "2025-01-02 00:01:00", 2L, "view", 1.0),
      (10L, "2025-01-02 00:02:00", 2L, "purchase", 2.0),
      (11L, "2025-01-02 00:03:00", 2L, "view", 3.0),
      (12L, "2025-01-02 00:04:00", 2L, "purchase", 4.0))
    withEvents(rows) { dir =>
      val m = ops.Cep.queries("cep_pattern_match")(spark, dir)
        .select("user_id", "n_views", "views_total", "purchase_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
      assert(m === Seq((1L, 2L, 30.0, 99.0), (2L, 1L, 1.0, 2.0),
        (2L, 1L, 3.0, 4.0)))
    }
  }

  test("pattern V+ C? P: optional single click bridged, double click " +
      "kills the match") {
    // user 1: V V P       -> match, via_click=false
    // user 2: V C P       -> match, via_click=true (greedy C? consumes)
    // user 3: V C C P     -> NO match (C? is maxed at one; the second
    //   click blocks P and no restart inside the click run can open V+)
    // user 4: V C V P     -> first view-run blocked (click's successor
    //   is a view); SECOND view-run matches directly
    val rows = Seq(
      (1L, "2025-01-01 00:01:00", 1L, "view", 10.0),
      (2L, "2025-01-01 00:02:00", 1L, "view", 20.0),
      (3L, "2025-01-01 00:03:00", 1L, "purchase", 99.0),
      (4L, "2025-01-01 00:01:00", 2L, "view", 5.0),
      (5L, "2025-01-01 00:02:00", 2L, "click", 0.0),
      (6L, "2025-01-01 00:03:00", 2L, "purchase", 88.0),
      (7L, "2025-01-01 00:01:00", 3L, "view", 1.0),
      (8L, "2025-01-01 00:02:00", 3L, "click", 0.0),
      (9L, "2025-01-01 00:03:00", 3L, "click", 0.0),
      (10L, "2025-01-01 00:04:00", 3L, "purchase", 77.0),
      (11L, "2025-01-01 00:01:00", 4L, "view", 2.0),
      (12L, "2025-01-01 00:02:00", 4L, "click", 0.0),
      (13L, "2025-01-01 00:03:00", 4L, "view", 3.0),
      (14L, "2025-01-01 00:04:00", 4L, "purchase", 66.0))
    withEvents(rows) { dir =>
      val m = ops.Cep.queries("cep_pattern_optional")(spark, dir)
        .select("user_id", "n_views", "via_click", "purchase_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          r.getDouble(3))).toSeq
      assert(m === Seq(
        (1L, 2L, false, 99.0),
        (2L, 1L, true, 88.0),
        (4L, 1L, false, 66.0)))
    }
  }

  test("pattern V{2,4} P: bounded greedy take, boundary run lengths") {
    // user 1: run of 1 view + P  -> NO match (below the {2,_} floor)
    // user 2: run of 2 views + P -> match, both views
    // user 3: run of 4 views + P -> match, all 4 (upper bound inclusive)
    // user 4: run of 5 views + P -> ONE match over the LAST 4 views
    //   (greedy cap: starts 0..n-5 fail because the 5th symbol is a V)
    def run(u: Long, nViews: Int, firstId: Long) =
      (0 until nViews).map(i => (firstId + i,
        f"2025-01-01 00:${i + 1}%02d:00", u, "view", (i + 1) * 10.0)) :+
        ((firstId + nViews, f"2025-01-01 00:${nViews + 1}%02d:00", u,
          "purchase", 99.0))
    val rows = (run(1L, 1, 100L) ++ run(2L, 2, 200L) ++ run(3L, 4, 300L) ++
      run(4L, 5, 400L)).map(t =>
      (t._1, t._2, t._3, t._4, t._5))
    withEvents(rows) { dir =>
      val m = ops.Cep.queries("cep_pattern_times")(spark, dir)
        .select("user_id", "n_views", "views_total", "purchase_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
      assert(m === Seq(
        (2L, 2L, 30.0, 99.0),            // 10+20
        (3L, 4L, 100.0, 99.0),           // 10+20+30+40
        (4L, 4L, 140.0, 99.0)))          // last 4 of 5: 20+30+40+50
      // matched tail start: user 4's match begins at its SECOND view
      val s4 = ops.Cep.queries("cep_pattern_times")(spark, dir)
        .where(col("user_id") === 4L).select("start_us").collect()
      val all4 = ops.Tables.events(spark, dir)
        .where(col("user_id") === 4L && col("event_type") === "view")
        .select(ops.Tables.ep(col("ts")).as("us")).orderBy("us")
        .collect().map(_.getLong(0))
      assert(s4.head.getLong(0) === all4(1))
    }
  }

  test("absence within 24h: keyed per event, not once per user") {
    // user 3: click then purchase 1h later (suppressed), a second click
    //   whose only later purchase is 25h away (emitted) — BOTH clicks of
    //   the same user are evaluated independently
    // user 4: click with no purchase ever (emitted)
    // user 5: click followed 1 min later by USER 6's purchase (emitted —
    //   absence is keyed on user)
    // user 7: purchase at the SAME microsecond as the click (emitted —
    //   time semantics, a simultaneous purchase is not "after")
    // user 8: purchase at exactly click + 24h (emitted — Flink prunes
    //   the partial match at elapsed >= window, the timeout fires first)
    val rows = Seq(
      (1L, "2025-01-01 00:00:00", 3L, "click", 0.0),
      (2L, "2025-01-01 01:00:00", 3L, "purchase", 5.0),
      (3L, "2025-01-01 02:00:00", 3L, "click", 0.0),
      (4L, "2025-01-02 03:00:00", 3L, "purchase", 6.0),
      (5L, "2025-01-01 00:00:00", 4L, "click", 0.0),
      (6L, "2025-01-01 00:00:00", 5L, "click", 0.0),
      (7L, "2025-01-01 00:01:00", 6L, "purchase", 7.0),
      (8L, "2025-01-01 00:00:00", 7L, "click", 0.0),
      (9L, "2025-01-01 00:00:00", 7L, "purchase", 8.0),
      (10L, "2025-01-01 00:00:00", 8L, "click", 0.0),
      (11L, "2025-01-02 00:00:00", 8L, "purchase", 9.0))
    withEvents(rows) { dir =>
      val out = ops.Cep.queries("cep_absence_timeout")(spark, dir)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out === Seq((3L, 3L), (4L, 5L), (5L, 6L), (7L, 8L), (8L, 10L)))
    }
  }

  test("notNext: per-event immediate negation, vacuous at end of stream") {
    // user 1: V C V V P V     -> event 1 excluded (next is click);
    //   3 matches: event 3 (next view), event 4 (next purchase),
    //   event 6 (end of stream, vacuous 'none')
    // user 2: C V             -> event 14 matches vacuously
    // ties: user 3 has V and C at the SAME timestamp — event_id breaks
    //   the tie, so the view (lower id) IS immediately followed by the
    //   click and must not match; the click's successor view matches
    val rows = Seq(
      (1L, "2025-01-01 00:01:00", 1L, "view", 1.0),
      (2L, "2025-01-01 00:02:00", 1L, "click", 0.0),
      (3L, "2025-01-01 00:03:00", 1L, "view", 2.0),
      (4L, "2025-01-01 00:04:00", 1L, "view", 3.0),
      (5L, "2025-01-01 00:05:00", 1L, "purchase", 9.0),
      (6L, "2025-01-01 00:06:00", 1L, "view", 4.0),
      (13L, "2025-01-02 00:01:00", 2L, "click", 0.0),
      (14L, "2025-01-02 00:02:00", 2L, "view", 5.0),
      (20L, "2025-01-03 00:01:00", 3L, "view", 6.0),
      (21L, "2025-01-03 00:01:00", 3L, "click", 0.0),
      (22L, "2025-01-03 00:02:00", 3L, "view", 7.0))
    withEvents(rows) { dir =>
      val m = ops.Cep.queries("cep_pattern_not_next")(spark, dir)
        .select("user_id", "event_id", "followed_by")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq
      assert(m === Seq((1L, 3L, "view"), (1L, 4L, "purchase"),
        (1L, 6L, "none"), (2L, 14L, "none"), (3L, 22L, "none")))
    }
  }

  test("followedBy/absence are an exact partition of all clicks") {
    // same window, same strict boundaries — corpus-wide, every click is
    // in exactly one of the two outputs
    val ev = ops.Tables.events(spark, sf)
    val nClicks = ev.where(col("event_type") === "click").count()
    val followed = q("cep_followed_within")
      .select("user_id", "event_id").persist()
    val absent = q("cep_absence_timeout").select("user_id", "event_id")
    assert(followed.count() + absent.count() === nClicks)
    assert(followed.join(absent, Seq("user_id", "event_id")).count() === 0)
    // emitted gaps are strictly positive and inside the window
    assert(q("cep_followed_within")
      .where(col("gap_us") <= 0 || col("gap_us") >= 86400000000L)
      .count() === 0)
    followed.unpersist(blocking = false)
  }

  test("iterative condition: first crossing per run, strict boundary, " +
      "singleton runs") {
    // T = 150. user 1: P60 P70 P40 (cum 60,130,170 -> crosses at #3),
    // then V, then P200 (singleton run crosses immediately).
    // user 2: P100 P50 -> cum exactly 150, NOT > 150 -> silent.
    // user 3: P100 V P100 -> two 1-purchase runs, neither crosses.
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 60.0),
      (2L, "2024-01-01 00:01:00", 1L, "purchase", 70.0),
      (3L, "2024-01-01 00:02:00", 1L, "purchase", 40.0),
      (4L, "2024-01-01 00:03:00", 1L, "view", 1.0),
      (5L, "2024-01-01 00:04:00", 1L, "purchase", 200.0),
      (6L, "2024-01-01 00:00:00", 2L, "purchase", 100.0),
      (7L, "2024-01-01 00:01:00", 2L, "purchase", 50.0),
      (8L, "2024-01-01 00:00:00", 3L, "purchase", 100.0),
      (9L, "2024-01-01 00:01:00", 3L, "view", 1.0),
      (10L, "2024-01-01 00:02:00", 3L, "purchase", 100.0))
    withEvents(rows) { dir =>
      val r = SparkEntry.queries("cep_iterative_condition")(spark, dir)
        .collect()
      assert(r.map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("n_events"),
        x.getAs[Double]("total"))).toSeq ===
        Seq((1L, 3L, 170.0), (1L, 1L, 200.0)))
      val first = r.head
      assert(first.getAs[Long]("cross_us") -
        first.getAs[Long]("run_start_us") === 120000000L)
    }
  }

  test("iterative condition: corpus-wide, the pre-crossing prefix never " +
      "exceeds the threshold") {
    // total > 150 by construction; total minus the crossing event's own
    // value (joined back by user+timestamp) must be <= 150 — i.e. the
    // match fired at the FIRST possible event, never later
    val r = q("cep_iterative_condition")
    assert(r.where(col("total") <= 150).count() === 0)
    val ev = graft.ops.Tables.events(spark, sf)
      .select(col("user_id"), graft.ops.Tables.ep(col("ts")).as("cross_us"),
        col("value"))
    val joined = q("cep_iterative_condition").join(ev, Seq("user_id", "cross_us"))
    assert(joined.count() === r.count())
    assert(joined.where(col("total") - col("value") > lit(150) + 1e-9)
      .count() === 0)
  }

  test("until: suffix after the last trigger, empty suffix kills the " +
      "match, trigger-free run passes whole") {
    // until(value > 90): u1 V50 V95 V30 P -> suffix [V30] matches;
    // u2 V50 V95 P -> trigger is last view, suffix empty, no match;
    // u3 V10 V20 P -> no trigger, whole run matches;
    // u4 V95 P -> singleton trigger run, no match.
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 50.0),
      (2L, "2024-01-01 00:01:00", 1L, "view", 95.0),
      (3L, "2024-01-01 00:02:00", 1L, "view", 30.0),
      (4L, "2024-01-01 00:03:00", 1L, "purchase", 10.0),
      (5L, "2024-01-01 00:00:00", 2L, "view", 50.0),
      (6L, "2024-01-01 00:01:00", 2L, "view", 95.0),
      (7L, "2024-01-01 00:02:00", 2L, "purchase", 10.0),
      (8L, "2024-01-01 00:00:00", 3L, "view", 10.0),
      (9L, "2024-01-01 00:01:00", 3L, "view", 20.0),
      (10L, "2024-01-01 00:02:00", 3L, "purchase", 5.0),
      (11L, "2024-01-01 00:00:00", 4L, "view", 95.0),
      (12L, "2024-01-01 00:01:00", 4L, "purchase", 5.0))
    withEvents(rows) { dir =>
      val r = SparkEntry.queries("cep_pattern_until")(spark, dir)
        .collect().map(x => (x.getAs[Long]("user_id"),
          x.getAs[Long]("n_views"), x.getAs[Double]("views_total"),
          x.getAs[Double]("purchase_value")))
      assert(r.toSeq === Seq((1L, 1L, 30.0, 10.0), (3L, 2L, 30.0, 5.0)))
    }
  }

  test("until: every match is a (possibly trimmed) cep_pattern_match run") {
    val until = q("cep_pattern_until").persist()
    val full = q("cep_pattern_match").persist()
    try {
      assert(until.count() > 0)
      // same user and same ending purchase; the until segment never
      // starts earlier and never takes more views than the full run
      val joined = until.as("u").join(full.as("f"),
        col("u.user_id") === col("f.user_id") &&
          col("u.end_us") === col("f.end_us"))
      assert(joined.count() === until.count())
      assert(joined.where(col("u.n_views") > col("f.n_views") ||
        col("u.start_us") < col("f.start_us")).count() === 0)
      // and the trimmed-vs-whole split is real in the fixture
      assert(until.count() < full.count())
    } finally { until.unpersist(); full.unpersist() }
  }

  test("fixture invariants: measures well-formed, matches don't overlap") {
    val m = q("cep_pattern_match").persist()
    assert(m.count() > 0)
    assert(m.where(col("n_views") < 1 || col("end_us") < col("start_us") ||
      col("views_total") < 0).count() === 0)
    // SKIP PAST LAST ROW: a later match's view-run begins after the
    // earlier match's purchase, so windows never strictly overlap
    // (boundaries may touch at microsecond ties — start < end pairs only)
    val a = m.select(col("user_id"), col("start_us").as("a_start"),
      col("end_us").as("a_end"))
    val b = m.select(col("user_id"), col("start_us").as("b_start"))
    assert(a.join(b, "user_id")
      .where(col("b_start") > col("a_start") && col("b_start") < col("a_end"))
      .count() === 0)
    m.unpersist()
    // emitted absences really have no same-user purchase in (t, t+24h)
    val ev = ops.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        ops.Tables.ep(col("ts")).as("p_us"))
      .where(col("event_type") === "purchase")
    val bad = q("cep_absence_timeout").join(ev, "user_id")
      .where(col("p_us") > col("click_us") &&
        col("p_us") < col("click_us") + 86400000000L)
    assert(bad.count() === 0)
  }
}
