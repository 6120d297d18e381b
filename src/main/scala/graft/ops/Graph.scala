package graft.ops

import org.apache.spark.sql.functions._

/** Iterative graph analytics (the Flink-Gelly side of the reference
  * genre — "Flink实时数仓", /root/reference/README.md:2). One flagship
  * op: PageRank over the customer↔supplier trade graph.
  *
  * Scale notes: each PageRank iteration is ONE keyed shuffle
  * (contributions grouped by destination) over an edge table joined to
  * the per-source rank — the `llm_dedup_clusters` contraction shape,
  * linear per round at any graph size, and every join is an equi join
  * (plan-asserted in PlanSpec). Per-iteration `localCheckpoint`
  * truncates the lineage so 5 rounds don't compound into one
  * mega-plan (the measured 61 s→9 s lesson from the dedup cluster
  * loop). Cross-engine determinism: per-edge contributions round to
  * 12 dp and accumulate in DECIMAL(38,12), and each iteration's rank
  * re-quantizes to 10 dp — both engines walk the identical quantized
  * trajectory, so the oracle compare is hash-exact, not approximate
  * (the SNIPPETS.md order-independent-money discipline applied to
  * rank mass).
  */
object Graph {
  import Tables._

  /** Damping factor and iteration count — fixed so the DuckDB oracle
    * can unroll the loop as plain CTEs (no recursive aggregation). */
  private val damping = 0.85
  private val iters = 5

  private val DecimalType38_12 =
    org.apache.spark.sql.types.DecimalType(38, 12)

  /** The static per-iteration join input (src, dst, deg): undirected
    * trade edges from orders ⋈ lineitem with each source's out-degree
    * attached. Built once per query and OpCache-tracked so the 5
    * rounds reuse one materialization. */
  def outEdges(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val pairs = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    edges.join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
  }

  /** ONE damped, quantized PageRank iteration: ranks(node, rank) ⋈
    * outEdges on the source key, contributions grouped by destination
    * — a single keyed shuffle, equi joins only (plan-asserted in
    * PlanSpec on exactly this un-checkpointed plan). */
  def iterate(ranks: org.apache.spark.sql.DataFrame,
      oe: org.apache.spark.sql.DataFrame, teleport: Double)
      : org.apache.spark.sql.DataFrame =
    oe.join(ranks, oe("src") === ranks("node"))
      .groupBy(col("dst"))
      .agg(round(lit(teleport) + lit(damping) *
        sum(round(col("rank") / col("deg"), 12)
          .cast(DecimalType38_12)).cast("double"), 10).as("rank"))
      .select(col("dst").as("node"), col("rank"))

  val queries: Map[String, Q] = Map(
    // PageRank over the bipartite customer↔supplier graph: an
    // UNDIRECTED edge per distinct (customer, supplier) pair that ever
    // traded (orders ⋈ lineitem), so no dangling-mass correction is
    // needed — every node has out-degree ≥ 1. Uniform start 1/N, 5
    // damped iterations, top-20 nodes by rank (ties broken by node id
    // so the cutoff is deterministic). The only driver-side scalar is
    // |N| — one count aggregate, the same class as the dedup-cluster
    // loop's convergence probe, never a per-row collect.
    "graph_pagerank" -> ((s, d) => {
      val oe = OpCache.track(outEdges(s, d))
      val nodes = oe.select(col("src")).distinct()
      // the only driver-side scalar is |N| — one count aggregate, the
      // same class as the dedup-cluster loop's convergence probe
      val n = nodes.count()
      val teleport = 0.15 / n // driver-computed double, same IEEE value
      // as the oracle's CAST(0.15 AS DOUBLE) / n
      var ranks = nodes.select(col("src").as("node"),
        lit(1.0 / n).as("rank"))
      for (_ <- 1 to iters)
        // localCheckpoint truncates lineage so 5 rounds don't compound
        // into one mega-plan (the dedup-cluster loop's 61 s→9 s lesson)
        ranks = iterate(ranks, oe, teleport).localCheckpoint()
      ranks.orderBy(col("rank").desc, col("node")).limit(20)
    })
  )

  /** The 5 iterations unrolled as plain CTEs (standard SQL forbids
    * aggregation in a recursive CTE term; unrolling keeps the oracle
    * ANSI and byte-deterministic). */
  val oracleSql: Map[String, String] = {
    val iterCte = (k: Int) =>
      s"""r$k AS (
         |  SELECT oe.dst AS node,
         |    round(CAST(0.15 AS DOUBLE) / (SELECT n FROM n)
         |      + CAST(0.85 AS DOUBLE) * CAST(sum(CAST(
         |          round(r.rank / oe.deg, 12) AS DECIMAL(38,12)))
         |        AS DOUBLE), 10) AS rank
         |  FROM r${k - 1} r JOIN oe ON r.node = oe.src
         |  GROUP BY oe.dst)""".stripMargin
    Map(
      "graph_pagerank" ->
        s"""WITH pairs AS (
           |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS (
           |  SELECT a AS src, b AS dst FROM pairs
           |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |oe AS (SELECT e.src, e.dst, d.deg
           |       FROM edges e JOIN deg d USING (src)),
           |n AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS node,
           |         CAST(1.0 AS DOUBLE) / (SELECT n FROM n) AS rank
           |       FROM deg),
           |${(1 to iters).map(iterCte).mkString(",\n")}
           |SELECT node, rank FROM r$iters
           |ORDER BY rank DESC, node LIMIT 20""".stripMargin
    )
  }
}
