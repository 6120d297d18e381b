package graft

import org.scalatest.funsuite.AnyFunSuite

/** Library-caller cache hygiene: ops that persist() an intermediate the
  * returned plan still references (simhash signatures, IVF assignments,
  * funnel stages) track the handle in OpCache, so a caller composing ops
  * WITHOUT the runners' between-queries clearCache() can still release
  * every block explicitly and leak nothing. */
class CacheHygieneSpec extends AnyFunSuite {
  import TestSpark._

  test("OpCache.release drops every op-persisted intermediate") {
    for (name <- Seq("llm_dedup_simhash", "llm_dedup_embcos", "llm_knn_ivf",
        "ads_funnel_steps")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      // deliberately NOT via q(): no clearCache — the library-caller path
      SparkEntry.queries(name)(spark, sf).collect()
      val during = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(during.nonEmpty,
        s"$name: expected the op to persist an intermediate")
      ops.OpCache.release(spark)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name leaked persisted RDDs: $leaked")
    }
  }

  test("release is idempotent and scoped to the session") {
    ops.OpCache.release(spark) // nothing tracked: no-op
    ops.OpCache.release(spark)
  }
}
