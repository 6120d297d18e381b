package graft

import org.scalatest.funsuite.AnyFunSuite

/** Library-caller cache hygiene: ops that persist() an intermediate the
  * returned plan still references (simhash signatures, IVF assignments,
  * funnel stages) track the handle in OpCache, so a caller composing ops
  * WITHOUT the runners' between-queries clearCache() can still release
  * every block explicitly and leak nothing. */
class CacheHygieneSpec extends AnyFunSuite {
  import TestSpark._

  test("curation gate stream leaks no persisted blocks across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_curhyg").toString
    Seq((0L, "s", "benchmark corpus text for the hygiene check"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/bench/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.Streams.curationGateStream(
      input.toDS().toDF("doc_id", "source", "text"),
      s"$dir/bench", s"$dir/artifacts", s"$dir/out", s"$dir/ckpt")
    for (b <- 1 to 3) {
      input.addData(Seq((b.toLong, "s", s"arriving shard doc number $b")))
      q.processAllAvailable()
    }
    q.stop()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"curation gate leaked persisted RDDs: $leaked")
  }

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

  test("OpCache.scope releases only handles tracked inside the scope") {
    import spark.implicits._
    ops.OpCache.release(spark)
    val outer = ops.OpCache.track(Seq(1, 2, 3).toDF("a"))
    outer.count()
    assert(outer.storageLevel.useMemory, "outer handle should be cached")
    val sc = ops.OpCache.scope(spark)
    val inner = ops.OpCache.track(Seq(4, 5).toDF("b"))
    inner.count()
    sc.release()
    // scope drops its own handle but never the caller's pre-existing one
    assert(!inner.storageLevel.useMemory, "inner handle should be dropped")
    assert(outer.storageLevel.useMemory,
      "scoped release must not touch caller caches")
    ops.OpCache.release(spark)
    assert(!outer.storageLevel.useMemory)
  }
}
