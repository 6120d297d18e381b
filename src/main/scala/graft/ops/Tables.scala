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
  /** Per-(session, path) reader memo — shared session STATE (a
    * catalog's role), not result caching: the memo holds the resolved
    * LOGICAL relation (file listing + parquet footer schema), so the
    * ~200-query bench session stops re-listing and re-inferring the
    * same ten immutable fixtures once per query (round-21 floor
    * decomposition: ~24 s of the sub-second keys' wall was DataFrame
    * CONSTRUCTION, mostly this driver-side metadata work — the same
    * cost `spark.sql.hive.filesourcePartitionFileCacheSize` exists to
    * amortize for catalog tables, guide §6). Every byte of data is
    * still read from parquet by every action; a fresh JVM re-lists.
    * WeakHashMap on the session: entries die with the session, and a
    * recycled identity can never serve another session's relation.
    * FRESHNESS: each entry records the path's (mtime, child count) at
    * load; a hit re-stats the path (two syscalls, no footer read) and
    * reloads on any change — an in-place rewrite of a table is never
    * served the stale listing (the REFRESH-TABLE semantics Spark's own
    * catalog file cache has, validated automatically). */
  private val readerMemo = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]]()

  private def pathStamp(p: String): String = {
    val f = new java.io.File(p)
    val kids = if (f.isDirectory) Option(f.list()).fold(0)(_.length) else -1
    s"${f.lastModified()}:${f.length()}:$kids"
  }

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val per = readerMemo.synchronized {
      var m = readerMemo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String,
          (String, DataFrame)]()
        readerMemo.put(s, m)
      }
      m
    }
    val path = s"$dir/$name.parquet"
    val stamp = pathStamp(path)
    def load(): (String, DataFrame) =
      (stamp,
        if (name == "events") eventsLoad(s, dir)
        else s.read.parquet(path))
    per.compute(s"$dir/$name", (_, cur) =>
      if (cur != null && cur._1 == stamp) cur else load())._2
  }

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark 4.x
    * rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    * rebuild a micro-precision timestamp (`ts div 1000` stays in exact
    * integer arithmetic — a double division would lose precision at
    * ~1.7e18 nanos). DuckDB truncates ns→us the same way, so epoch_us
    * comparisons line up. */
  def events(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")

  private def eventsLoad(s: SparkSession, dir: String): DataFrame = {
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
