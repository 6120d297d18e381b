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
    s.read.parquet(s"$dir/$name.parquet")

  /** timestamp -> epoch microseconds (bigint): exact, engine-neutral. */
  def ep(c: Column): Column = unix_micros(c)

  val dec: DecimalType = DecimalType(18, 2)

  /** Order-independent money sum: exact decimal accumulate, then double. */
  def dsum(c: Column): Column = round(sum(c.cast(dec)).cast("double"), 2)

  /** Deterministic average: exact decimal sum / count, rounded. */
  def davg(c: Column): Column =
    round(sum(c.cast(dec)).cast("double") / count(lit(1)), 4)
}
