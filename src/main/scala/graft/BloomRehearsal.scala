package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime BLOOM-FILTER join pruning rehearsal (round-14 verdict item
  * 2): the row-level companion to dynamic partition pruning for
  * UNpartitioned join keys. A selective dim filter builds a bloom
  * filter at run time (`bloom_filter_agg` over the dim's join keys)
  * and the fact side is pre-filtered with `might_contain(xxhash64(k))`
  * BEFORE its shuffle — on a 100 TB fact ⋈ 2%-selective dim SMJ that
  * eliminates ~98% of the shuffled bytes, which no static rule can do
  * because the surviving key set only exists at run time.
  *
  * Measures the fact ⋈ filtered-dim sort-merge join with
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` on vs off,
  * INTERLEAVED median-of-5 (the established A/B protocol: alternating
  * runs cancel host drift), at the given corpus and a ×N replicated
  * fact. Broadcast is disabled so the dim never short-circuits the
  * shuffle under test; the application-side scan floor is dropped
  * because the rule's 10 GB default is sized for production facts,
  * not fixtures (the two deployment preconditions, like the AQE
  * skew-join rehearsal documents for its thresholds).
  *
  * PlanSpec pins the plan shape (might_contain on the fact key; none
  * when disabled); this main records the speed-up in BENCH_LOG.
  *
  * Usage: runMain graft.BloomRehearsal [sfDir] [mult ...]
  * (defaults: /root/testdata/sf0.1, mults 1 10)
  */
object BloomRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def withConfs(kv: (String, String)*)(body: => Double): Double = {
      val saved = kv.map { case (k, _) => (k, spark.conf.getOption(k)) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    def timedNoop(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val base = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val floor = ("spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold") -> "0"
    val onConf = "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true"
    val offConf = "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false"

    mults.foreach { mult =>
      // ×N fact: each replica keeps l_partkey (dim selectivity and the
      // bloom's key domain are unchanged) and disambiguates orderkey
      val liPath =
        if (mult == 1) s"$sfDir/lineitem.parquet"
        else {
          val dir = s"/tmp/graft_bloom/x$mult/lineitem.parquet"
          if (!new java.io.File(s"$dir/_SUCCESS").isFile) {
            spark.read.parquet(s"$sfDir/lineitem.parquet")
              .crossJoin(spark.range(mult).select(col("id").as("rep")))
              .withColumn("l_orderkey",
                col("l_orderkey") * mult + col("rep"))
              .drop("rep")
              .repartition(64)
              .write.mode("overwrite").parquet(dir)
          }
          dir
        }
      def query() = spark.read.parquet(liPath)
        .join(spark.read.parquet(s"$sfDir/part.parquet")
            .where(col("p_size") === 1),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_size")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"))
      // warmup outside the timed region (codegen + reader init), and
      // the joined row count for the selectivity record
      val joined = query().agg(sum(col("n"))).collect()(0).getLong(0)
      val factRows = spark.read.parquet(liPath).count()
      val (ons, offs) = (1 to 5).map { _ =>
        val tOn = withConfs(base, floor, onConf)(timedNoop(query()))
        val tOff = withConfs(base, floor, offConf)(timedNoop(query()))
        (tOn, tOff)
      }.unzip
      def f(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
      val line = s"""{"bloom":{"mult":$mult,"fact_rows":$factRows,""" +
        s""""joined_rows":$joined,""" +
        s""""on":[${ons.map(f).mkString(",")}],""" +
        s""""off":[${offs.map(f).mkString(",")}],""" +
        s""""median_on":${f(median(ons))},""" +
        s""""median_off":${f(median(offs))}}}"""
      println(line)
    }
    spark.stop()
  }
}
