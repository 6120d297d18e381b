package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Ev, Streams, Warehouse}

/** End-to-end layered pipeline: ODS→DWD→DWS→ADS over a MemoryStream,
  * compared against the same layers computed in batch. */
class WarehouseSpec extends AnyFunSuite {
  import TestSpark._

  test("streamed warehouse ADS equals the batch-computed top-N") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val events = Streams.typed(ops.Tables.events(spark, sf))
      .orderBy("event_id").collect().toSeq

    val input = MemoryStream[Ev]
    val query = Warehouse.run(input.toDS().toDF(), topN = 2,
      s"$dir/ads", s"$dir/ckpt")
    val chunks = events.grouped((events.size + 3) / 4).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      input.addData(c); query.processAllAvailable()
      if (i == 1) {
        // at-least-once redelivery: replay the whole chunk — the DWD
        // dedup guard (dropDuplicatesWithinWatermark on event_id +
        // late-drop behind the watermark) must keep the ADS output
        // identical to the batch reference that saw each event once
        input.addData(c); query.processAllAvailable()
      }
    }
    // flush sentinel: advances the watermark so every REAL window
    // finalizes; its own (far-future) window never emits in append mode
    val maxUs = events.map(_.ts_us).max
    val flushUs = maxUs + 30L * 24 * 3600 * 1000000
    input.addData(graft.streaming.Ev(-1L, -1L,
      new java.sql.Timestamp(flushUs / 1000), flushUs, "view", 0.0))
    query.processAllAvailable()
    query.stop()

    // batch reference: same layer functions on the bounded table
    val batchDws = Warehouse.hourlyActivity(
      Warehouse.clean(ops.Tables.events(spark, sf)))
    val w = Window.partitionBy("w_start").orderBy(col("n").desc,
      col("event_type"))
    val batchAds = batchDws.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2)
      .select(col("w_start"), col("event_type"), col("n"), col("rk"))

    val streamedAds = spark.read.parquet(s"$dir/ads")
      .select(col("w_start"), col("event_type"), col("n"), col("rk"))
    assert(streamedAds.count() === batchAds.count())
    assert(streamedAds.join(batchAds,
        Seq("w_start", "event_type", "n", "rk")).count() === batchAds.count())
  }
}
