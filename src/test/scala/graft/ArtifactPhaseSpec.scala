package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 optimization regression net: the parallel materialization
  * phase (`Scans.tableArtifactBuild` — all content-keyed table/graph/
  * LLM artifact chains overlapped on a bounded pool) must leave every
  * reader key serving exactly what the old sequential in-key builds
  * served. The phase is pure wall-clock restructuring — same builders,
  * same roots — so the assertions here are the keys' own structural
  * booleans and row accounting, read AFTER a forced concurrent build.
  */
class ArtifactPhaseSpec extends AnyFunSuite {
  import TestSpark._

  test("parallel phase builds every chain; reader keys serve the " +
      "built tables with their structural claims intact") {
    // force real concurrency even on the 4-core test session — the
    // point is racing the 20+ chains against each other
    spark.conf.set("spark.graft.artifactBuildThreads", "6")
    try graft.ops.Scans.tableArtifactBuild(spark, sf,
      includeGraph = true, includeLlm = true, includeBucketed = true)
    finally spark.conf.unset("spark.graft.artifactBuildThreads")

    // structural-boolean keys: the flag TRUE proves the chain built
    // complete (maintenance ran, widen was metadata-only, clone
    // byte-copied, merge was MOR, restore was exact, stream fold
    // published); FALSE or an exception means the concurrent build
    // corrupted or half-published a root
    val flagged = Seq(
      "table_sql_maintenance" -> "maintained",
      "table_type_widening" -> "widened",
      "table_clone" -> "cloned",
      "table_merge_dv" -> "merge_on_read",
      "table_merge_pruned" -> "file_merge",
      "table_restore" -> "restored_exact",
      "table_schema_evolution" -> "rename_neutral",
      "table_stream_door" -> "streamed",
      "table_incremental_append" -> "incremental")
    flagged.foreach { case (key, flag) =>
      val rows = q(key).collect()
      assert(rows.nonEmpty, s"$key returned no rows")
      val i = rows.head.fieldIndex(flag)
      assert(rows.forall(r => r.getBoolean(i)), s"$key !$flag")
    }

    // row-serving keys over phase-built roots: nonzero output proves
    // the root is readable end-to-end after the concurrent build
    Seq("table_time_travel", "table_stats_pruning",
      "table_zorder_skipping", "table_bloom_skipping",
      "sink_snapshot_merge", "table_cdf_consume",
      "join_bucketed_colocated", "llm_dedup_clusters",
      "llm_dedup_embcos", "graph_pagerank").foreach { key =>
      assert(q(key).limit(5).collect().nonEmpty, s"$key empty")
    }

    // idempotence: a second phase invocation on published roots must
    // be a cheap no-op walk (content-keyed gates), not a rebuild —
    // generous bound; a rebuild of 20+ chains takes far longer
    val t0 = System.nanoTime()
    graft.ops.Scans.tableArtifactBuild(spark, sf,
      includeGraph = true, includeLlm = true, includeBucketed = true)
    val warm = (System.nanoTime() - t0) / 1e9
    assert(warm < 30.0, f"warm phase re-invocation took $warm%.1f s")
  }
}
