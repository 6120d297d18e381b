package graft.streaming

import org.apache.spark.sql.SparkSession

/** End-to-end streaming demo: a live rate source driven through the
  * window / keyed-state wrappers to memory sinks for a few seconds.
  * Usage: runMain graft.streaming.StreamSmoke [seconds] */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = Streams.rateEvents(spark, rowsPerSecond = 200)
    val q1 = Streams.tumblingCounts(events)
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    val q2 = Streams.visitCounter(Streams.typed(events))
      .writeStream.format("memory").queryName("visits")
      .outputMode("append").start()
    val q3 = Streams.sessionAgg(events)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    val q4 = Streams.visitCounterTtl(
        Streams.typed(events).withWatermark("ts", "0 seconds"),
        ttlMs = 60L * 1000)
      .writeStream.format("memory").queryName("ttl_visits")
      .outputMode("append").start()

    Thread.sleep(secs * 1000L)
    Seq(q1, q2, q3, q4).foreach(_.processAllAvailable())
    println(s"TUMBLING_ROWS=${spark.table("tumbling").count()}")
    println(s"VISIT_ROWS=${spark.table("visits").count()}")
    val newVisits = spark.table("visits")
      .where(org.apache.spark.sql.functions.col("visit_kind") === "new").count()
    println(s"VISIT_NEW=$newVisits")
    println(s"SESSION_ROWS=${spark.table("sessions").count()}")
    println(s"TTL_VISIT_ROWS=${spark.table("ttl_visits").count()}")
    Seq(q1, q2, q3, q4).foreach(_.stop())
    spark.stop()
  }
}
