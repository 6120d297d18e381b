package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.8 streaming-op batch-form invariants. */
class StreamingBatchSpec extends AnyFunSuite {
  import TestSpark._

  test("tumbling windows partition all events") {
    val total = ops.Tables.events(spark, sf).count()
    assert(q("stream_window_tumbling").agg(sum("n")).first().getLong(0) === total)
  }

  test("sliding windows count each event slide/duration times") {
    val total = ops.Tables.events(spark, sf).count()
    // 1h window / 15m slide => every event is in exactly 4 windows
    assert(q("stream_window_sliding").agg(sum("n")).first().getLong(0) === 4 * total)
  }

  test("sessions: events partition into sessions; bounds are consistent") {
    val sess = q("stream_window_session")
    val total = ops.Tables.events(spark, sf).count()
    assert(sess.agg(sum("n_events")).first().getLong(0) === total)
    assert(sess.where(col("sess_end_us") < col("sess_start_us")).count() === 0)
  }

  test("sessionization golden: crafted trace with gap exactly at boundary") {
    import spark.implicits._
    // user 1: events at 0s, 100s, 100s+30min (gap == 30min -> same session
    // would require gap > 30min to split; 1800000000us is NOT > 30min)
    val us = 1000000L
    val df = Seq(
      (1L, 1L, 0L), (2L, 1L, 100L * us), (3L, 1L, 100L * us + 1800L * us),
      (4L, 1L, 100L * us + 1800L * us + 1801L * us), // gap 30min+1s -> new
      (5L, 2L, 0L)
    ).toDF("event_id", "user_id", "ts_us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"))
    df.write.mode("overwrite").parquet("/tmp/graft_test_events/events.parquet")
    val sess = SparkEntry.queries("stream_window_session")(
      spark, "/tmp/graft_test_events")
    val perUser = sess.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser === Map(1L -> 2L, 2L -> 1L))
  }

  test("watermark: earliest-arriving event is never late") {
    val first = q("stream_watermark_late").orderBy("event_id").first()
    assert(first.getAs[Int]("is_late") === 0)
  }

  test("stateful counter: exactly one 'new' per user") {
    val news = q("stream_stateful_counter").where(col("visit_kind") === "new")
    val users = ops.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(news.count() === users)
    assert(news.select("user_id").distinct().count() === users)
  }

  test("cep funnel: strictly ordered view < click < purchase") {
    val f = q("stream_cep_pattern")
    assert(f.where(col("view_us") >= col("click_us") ||
      col("click_us") >= col("purchase_us")).count() === 0)
  }

  test("upsert latest: one row per user, at the user's max ts") {
    val latest = q("stream_upsert_latest")
    val maxTs = ops.Tables.events(spark, sf)
      .groupBy("user_id").agg(ops.Tables.ep(max(col("ts"))).as("mx"))
    assert(latest.join(maxTs, "user_id")
      .where(col("ts_us") =!= col("mx")).count() === 0)
  }
}
