package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.1/§2.2 invariants: scans, row ops, CDC latest-image. */
class RowOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("scan_parquet returns every lineitem row") {
    assert(q("scan_parquet").count() ===
      spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("scan_projected rows all satisfy the pushed predicate") {
    val bad = q("scan_projected").where(col("l_extendedprice") <= 0).count()
    assert(bad === 0)
    assert(q("scan_projected").columns.toSet ===
      Set("l_orderkey", "l_linenumber", "l_extendedprice"))
  }

  test("filter_predicate output satisfies every conjunct") {
    val df = q("filter_predicate")
    assert(df.where(!col("l_returnflag").isin("A", "R")).count() === 0)
    assert(df.where(col("l_quantity") < 5 || col("l_quantity") > 45).count() === 0)
  }

  test("project_compute: disc_price <= extendedprice, charge >= disc_price") {
    val df = q("project_compute")
    assert(df.where(col("charge") < col("disc_price")).count() === 0)
  }

  test("dedup is idempotent") {
    val once = q("dedup_exact")
    assert(once.distinct().count() === once.count())
  }

  test("side_output_split routes every event exactly once") {
    val ev = ops.Tables.events(spark, sf)
    val routed = q("side_output_split")
    assert(routed.count() === ev.count())
    assert(routed.select("event_id").distinct().count() === ev.count())
  }

  test("cdc_ingest keeps at most one image per key and drops deletes") {
    val df = q("cdc_ingest")
    assert(df.groupBy("user_id").count().where(col("count") > 1).count() === 0)
    assert(df.where(col("op") === "D").count() === 0)
  }

  test("sink_foreach_upsert converges to one latest row per user") {
    val df = q("sink_foreach_upsert")
    assert(df.groupBy("user_id").count().where(col("count") > 1).count() === 0)
  }

  test("cdc_retract_agg: signed changelog fold equals the direct " +
      "latest-image board") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val direct = ops.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .groupBy(floor(col("value") / 100).cast("long").as("band"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("value").cast(ops.Tables.dec)).cast("double"), 2)
          .as("total"))
      .orderBy("band")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val folded = q("cdc_retract_agg")
      .collect().map(r => (r.getAs[Long]("band"), r.getAs[Long]("n_users"),
        r.getAs[Double]("total")))
    assert(folded.toSeq === direct.toSeq)
  }

  test("cdc_retract_agg: delete retracts, re-insert after delete, " +
      "vacated bands net to zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("retract_spec").toString
    // user 1: P250 then P50  -> update retracts band 2, lands in band 0
    // user 2: P120, DELETE, P30 -> delete retracts, re-insert in band 0
    // user 3: P90, DELETE -> fully deleted, absent
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 250.0),
      (2L, "2024-01-01 00:01:00", 1L, "purchase", 50.0),
      (3L, "2024-01-01 00:00:00", 2L, "purchase", 120.0),
      (4L, "2024-01-01 00:01:00", 2L, "error", 1.0),
      (5L, "2024-01-01 00:02:00", 2L, "purchase", 30.0),
      (6L, "2024-01-01 00:00:00", 3L, "purchase", 90.0),
      (7L, "2024-01-01 00:01:00", 3L, "error", 1.0))
      .map { case (id, ts, u, et, v) =>
        (id, java.sql.Timestamp.valueOf(ts), u, et, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val r = SparkEntry.queries("cdc_retract_agg")(spark, dir)
        .collect().map(x => (x.getAs[Long]("band"), x.getAs[Long]("n_users"),
          x.getAs[Double]("total")))
      assert(r.toSeq === Seq((0L, 2L, 80.0)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }
}
