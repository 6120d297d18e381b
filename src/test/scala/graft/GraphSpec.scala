package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `graph_pagerank` — the iterative-graph op (Flink-Gelly genre). */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("graph_pagerank: top-20 is descending, positive, and the leader " +
      "beats the uniform rank") {
    val rows = q("graph_pagerank").collect()
    assert(rows.length === 20)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.forall(r => r > 0 && r < 1))
    ranks.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    // total mass is 1 (undirected graph, no dangling nodes), so the
    // max rank is at least the uniform 1/N
    val n = {
      val o = graft.ops.Tables.t(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = graft.ops.Tables.t(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey")).distinct().count() +
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select(col("l_suppkey")).distinct().count()
    }
    assert(ranks.head >= 1.0 / n)
  }

  test("graph_pagerank: quantized trajectory is run-to-run deterministic") {
    val a = q("graph_pagerank").collect().map(_.toSeq)
    val b = q("graph_pagerank").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
