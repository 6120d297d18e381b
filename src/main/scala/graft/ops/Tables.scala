package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared loaders + oracle-compare conventions (see FIXTURES.md):
  * every query ends in a deterministic ORDER BY on a unique key; money
  * aggregates accumulate in exact DECIMAL(18,2) (order-independent across
  * partitions, unlike double sums) and only then convert to double;
  * timestamps cross the Spark/DuckDB boundary as epoch microseconds.
  *
  * Scale note: loaders return plain parquet scans so Catalyst keeps
  * predicate pushdown + column pruning; nothing here collects to the
  * driver.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark 4.x
    * rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    * rebuild a micro-precision timestamp (`ts div 1000` stays in exact
    * integer arithmetic — a double division would lose precision at
    * ~1.7e18 nanos). DuckDB truncates ns→us the same way, so epoch_us
    * comparisons line up. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // NANOS read as long
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // already a (micro/milli) timestamp, possibly NTZ
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** timestamp -> epoch microseconds (bigint): exact, engine-neutral.
    * Fixtures read as TIMESTAMP_NTZ; the session is pinned UTC so the
    * cast to TIMESTAMP is wall-clock-identity and matches DuckDB's
    * epoch_us over the same (naive) parquet values. */
  def ep(c: Column): Column = unix_micros(c.cast("timestamp"))

  val dec: DecimalType = DecimalType(18, 2)
  val dec6: DecimalType = DecimalType(28, 6)

  /** Exact 2-dp rounding of a money product (≤6 true decimals, e.g.
    * price*(1-disc)*(1+tax)): cast the double to DECIMAL(28,6) — an
    * unambiguous rounding both engines agree on — then round half-up in
    * exact decimal. Rounding the raw double instead hits half-tie cases
    * where Spark and DuckDB disagree by 0.01. */
  def money2(c: Column): Column = round(c.cast(dec6), 2).cast("double")

  /** Order-independent sum of money products: per-row DECIMAL(28,6)
    * (exact for ≤6-decimal products), exact decimal sum, round to 2. */
  def dsum6(c: Column): Column = round(sum(c.cast(dec6)), 2).cast("double")

  /** Order-independent money sum: exact decimal accumulate, then double. */
  def dsum(c: Column): Column = round(sum(c.cast(dec)).cast("double"), 2)

  /** Deterministic average: exact decimal sum / count, rounded. */
  def davg(c: Column): Column =
    round(sum(c.cast(dec)).cast("double") / count(lit(1)), 4)
}
