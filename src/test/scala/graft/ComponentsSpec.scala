package graft

import org.scalatest.funsuite.AnyFunSuite

/** connectedComponents on adversarial graph shapes the parquet-fixture
  * oracles can't produce: long paths whose diameter exceeds any fixed
  * contraction round count (the round-4 8-round loop mislabeled exactly
  * these), and mixed chains/cliques that must keep distinct labels. */
class ComponentsSpec extends AnyFunSuite {
  import TestSpark._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.ops.LlmExtra.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("40-vertex path: every vertex labels to the chain minimum") {
    val labels = cc((1L to 39L).map(i => (i, i + 1)))
    assert(labels.size === 40)
    assert(labels.values.forall(_ == 1L), labels.toSeq.sorted.mkString(","))
  }

  test("descending chain plus separate clique keep distinct min labels") {
    // ids descend along the chain, so first-round hooks all point to the
    // adjacent smaller id (worst case for hook-only contraction)
    val chain = (100L until 140L).map(i => (i, i + 1))
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 5L) yield (a, b)
    val labels = cc(chain ++ clique)
    assert((100L to 140L).forall(labels(_) == 100L))
    assert((1L to 5L).forall(labels(_) == 1L))
    assert(labels.size === 46)
  }

  test("empty pair list yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }
}
