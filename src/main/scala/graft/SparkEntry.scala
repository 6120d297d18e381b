package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` aggregate the per-category maps from `graft.ops`
  * so every ops file auto-registers; keys are SURVEY.md §2 rows.
  */
object SparkEntry {
  /** Flagship (SURVEY §7.2): hourly purchase revenue + distinct buyers,
    * top-3 hours — scan → filter → tumbling window agg → Top-N → sort.
    * Driver smoke-checks rows>0 on /root/testdata/sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = ops.Tables.events(spark, "/root/testdata/sf0.001")
    ev.where(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"))
      .agg(ops.Tables.dsum(col("value")).as("revenue"),
        countDistinct(col("user_id")).as("buyers"))
      .orderBy(col("revenue").desc, col("hour"))
      .limit(3)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Scans.queries ++ ops.RowOps.queries ++ ops.Joins.queries ++
      ops.JoinsAsync.queries ++
      ops.Aggs.queries ++ ops.Windows.queries ++ ops.SetOps.queries ++
      ops.Fns.queries ++ ops.Streaming.queries ++ ops.Llm.queries ++
      ops.LlmExtra.queries ++ ops.Ads.queries ++ ops.Cep.queries ++
      ops.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Scans.oracleSql ++ ops.RowOps.oracleSql ++ ops.Joins.oracleSql ++
      ops.JoinsAsync.oracleSql ++
      ops.Aggs.oracleSql ++ ops.Windows.oracleSql ++ ops.SetOps.oracleSql ++
      ops.Fns.oracleSql ++ ops.Streaming.oracleSql ++ ops.Llm.oracleSql ++
      ops.LlmExtra.oracleSql ++ ops.Ads.oracleSql ++ ops.Cep.oracleSql ++
      ops.Graph.oracleSql
}
