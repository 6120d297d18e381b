package graft.ops

import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 — global sort/limit and set operations.
  *
  * Flink anchors: Table ORDER BY/LIMIT (batch mode), DataStream.union,
  * Table INTERSECT/EXCEPT.
  *
  * Scale notes: `orderBy(...).limit(k)` plans TakeOrderedAndProject —
  * per-partition top-k then a k-row driver merge, never a global sort.
  * intersect/except are distinct-aggregating shuffles on the compared
  * columns (project to the narrow key set first, as here).
  */
object SetOps {
  import Tables._

  val queries: Map[String, Q] = Map(
    // ADS serving query: global top-100 orders by price.
    "sort_limit_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2)
          .as("o_totalprice"))),

    // Merge parallel streams (genre: union of log topics).
    "set_union_all" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.where(col("event_type") === "view")
        .unionByName(ev.where(col("event_type") === "signup"))
        .select(col("event_id"), col("event_type"), col("user_id"))
        .orderBy("event_id")
    }),

    // DISTINCT union (Flink SQL UNION vs UNION ALL): the deduplicating
    // merge — users reachable through EITHER channel, once each. Plans
    // as union + distinct-aggregate: one shuffle on the projected key,
    // map-side partial dedup first, so at 100 TB only the surviving
    // distinct keys cross the wire.
    "set_union" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.where(col("event_type") === "view").select("user_id")
        .union(ev.where(col("event_type") === "purchase")
          .select("user_id"))
        .distinct()
        .orderBy("user_id")
    }),

    // Audience overlap: users who both viewed and purchased.
    "set_intersect" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.where(col("event_type") === "view").select("user_id")
        .intersect(
          ev.where(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    }),

    // Churn set: viewers who never purchased.
    // EXCEPT with a non-empty result at every scale: all customers
    // minus those holding a high-value order (the 50-user events
    // fixture gives every user every event type, which made an
    // event-type-based EXCEPT vacuously empty).
    "set_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, d, "orders").where(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // Bag-semantics EXCEPT (multiplicities subtract, not vanish): each
    // customer's key survives n_orders − n_highvalue times. Catalyst
    // rewrites exceptAll as a count-aggregate + replication generate —
    // one shuffle on the compared key, no distinct pass, no join.
    "set_except_all" -> ((s, d) =>
      t(s, d, "orders").select(col("o_custkey").as("custkey"))
        .exceptAll(t(s, d, "orders").where(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // Bag-semantics INTERSECT: per user min(n_views, n_purchases)
    // copies — the multiset overlap a frequency-capped audience query
    // wants (set_intersect's DISTINCT answer loses the multiplicity).
    "set_intersect_all" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.where(col("event_type") === "view").select("user_id")
        .intersectAll(
          ev.where(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sort_limit_topk" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "set_union_all" ->
      """SELECT event_id, event_type, user_id FROM events WHERE event_type='view'
        |UNION ALL
        |SELECT event_id, event_type, user_id FROM events WHERE event_type='signup'
        |ORDER BY event_id""".stripMargin,
    "set_union" ->
      """SELECT user_id FROM events WHERE event_type='view'
        |UNION
        |SELECT user_id FROM events WHERE event_type='purchase'
        |ORDER BY user_id""".stripMargin,
    "set_intersect" ->
      """SELECT user_id FROM events WHERE event_type='view'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type='purchase'
        |ORDER BY user_id""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |ORDER BY custkey""".stripMargin,
    "set_except_all" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT user_id FROM events WHERE event_type='view'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type='purchase'
        |ORDER BY user_id""".stripMargin
  )
}
