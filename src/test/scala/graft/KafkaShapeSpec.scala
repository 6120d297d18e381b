package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Kafka-record payload for the streaming decode test (mirrors the
  * Kafka source schema's data columns). */
case class KafkaRec(key: Array[Byte], value: Array[Byte], topic: String,
    partition: Int, offset: Long)

/** Executable verification of the Kafka ODS ingest deserialization:
  * `Streams.decodeKafkaEvents` is everything `kafkaIngest` does after
  * `.load()`, so round-tripping fixture events through JSON bytes in
  * the Kafka record shape exercises the ingest path end-to-end minus
  * only the broker connection itself (no broker / connector jar in
  * this env). */
class KafkaShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def eventsTyped = ops.Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
      col("value"), col("props"))

  private def kafkaShaped = eventsTyped.select(
    encode(col("event_id").cast("string"), "UTF-8").as("key"),
    encode(to_json(struct(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"), col("props")),
      // default timestampFormat truncates to millis; keep micros
      Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
      "UTF-8").as("value"),
    lit("events").as("topic"),
    pmod(col("event_id"), lit(4)).cast("int").as("partition"),
    col("event_id").as("offset"))

  test("decodeKafkaEvents round-trips fixture events through JSON bytes") {
    val decoded = Streams.decodeKafkaEvents(kafkaShaped)
    val orig = eventsTyped
    assert(decoded.count() === orig.count())
    // no field is lost or corrupted by serialize -> bytes -> parse
    val mism = decoded.select(col("event_id"), col("user_id"),
        ops.Tables.ep(col("ts")).as("ts_us"), col("event_type"),
        col("value"), col("props"))
      .join(orig.select(col("event_id"), col("user_id").as("o_uid"),
        ops.Tables.ep(col("ts")).as("o_ts_us"), col("event_type").as("o_et"),
        col("value").as("o_v"), col("props").as("o_p")), "event_id")
      .where(col("user_id") =!= col("o_uid") ||
        col("ts_us") =!= col("o_ts_us") ||
        col("event_type") =!= col("o_et") ||
        col("value") =!= col("o_v") ||
        coalesce(col("props"), lit("")) =!= coalesce(col("o_p"), lit("")))
    assert(mism.count() === 0)
    // kafka metadata columns ride along
    assert(decoded.columns.toSet
      .intersect(Set("topic", "partition", "offset")).size === 3)
  }

  test("decodeKafkaEvents works as a streaming transform (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val recs = kafkaShaped.limit(200).as[KafkaRec].collect().toSeq
    val input = MemoryStream[KafkaRec]
    val query = Streams.decodeKafkaEvents(input.toDF())
      .writeStream.format("memory").queryName("kafka_decoded")
      .outputMode("append").start()
    recs.grouped(80).foreach { c =>
      input.addData(c); query.processAllAvailable()
    }
    query.stop()
    val got = spark.table("kafka_decoded")
    assert(got.count() === recs.size)
    assert(got.where(col("event_id").isNull).count() === 0)
  }
}
