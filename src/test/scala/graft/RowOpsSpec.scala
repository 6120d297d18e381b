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
}
