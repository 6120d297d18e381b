package graft.ops

import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — projection / filter / flatMap / side-output / dedup.
  * Flink anchors: DataStream.map/filter/flatMap, ProcessFunction side
  * outputs, keyed ValueState dedup. All expressed as Catalyst expressions
  * so whole-stage codegen + pushdown stay intact.
  */
object RowOps {
  import Tables._

  val queries: Map[String, Q] = Map(
    // net price = extprice * (1-disc) * (1+tax): per-row arithmetic + rename.
    // money2 rounds via exact decimal; (orderkey, linenumber) is NOT unique
    // in the fixture, so the ORDER BY covers every output column.
    "project_compute" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          money2(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("disc_price"),
          money2(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("charge"))
        .orderBy("l_orderkey", "l_linenumber", "disc_price", "charge")),

    // BETWEEN + IN-list + LIKE + conjunction; pushes to the parquet scan.
    "filter_predicate" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate").between(
          lit("1994-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
          && col("l_returnflag").isin("A", "R")
          && col("l_quantity").between(5, 45)
          && col("l_linestatus").like("F%"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")),

    // One-to-many: doc text -> words (aggregated per word for a
    // deterministic, order-stable output).
    "flatmap_explode" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word")
        .agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "word")),

    // Flink side outputs: one parent stream routed into N children by
    // predicate (dirty / low-value / main), re-unioned with a route tag
    // so the oracle can CASE it.
    "side_output_split" -> ((s, d) => {
      val ev = t(s, d, "events")
      val dirty = ev.where(col("event_type") === "error")
        .withColumn("route", lit("dirty"))
      val low = ev.where(col("event_type") =!= "error" && col("value") < 1.0)
        .withColumn("route", lit("low"))
      // Complement predicate (NULL value → "main") so every row lands in
      // exactly one child, matching the oracle's CASE ladder under nulls.
      val main = ev.where(col("event_type") =!= "error" &&
          coalesce(col("value") >= 1.0, lit(true)))
        .withColumn("route", lit("main"))
      dirty.unionByName(low).unionByName(main)
        .select(col("event_id"), col("route"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy("event_id")
    }),

    // Exact dedup (genre: ValueState seen-flag; north-star exact dedup).
    "dedup_exact" -> ((s, d) =>
      t(s, d, "events")
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type"))
  )

  val oracleSql: Map[String, String] = Map(
    "project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(round(CAST(l_extendedprice * (1-l_discount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS disc_price,
        | CAST(round(CAST(l_extendedprice * (1-l_discount) * (1+l_tax) AS DECIMAL(28,6)), 2) AS DOUBLE) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_price, charge""".stripMargin,
    "filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_returnflag IN ('A','R')
        |  AND l_quantity BETWEEN 5 AND 45
        |  AND l_linestatus LIKE 'F%'
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin,
    "flatmap_explode" ->
      """SELECT doc_id, word, count(*) AS n
        |FROM (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
        |GROUP BY doc_id, word ORDER BY doc_id, word""".stripMargin,
    "side_output_split" ->
      """SELECT event_id,
        | CASE WHEN event_type = 'error' THEN 'dirty'
        |      WHEN value < 1.0 THEN 'low' ELSE 'main' END AS route,
        | event_type, round(value,2) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "dedup_exact" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin
  )
}
