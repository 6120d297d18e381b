package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for intermediates an operator `persist()`s but cannot
  * unpersist in-op: `queries` entries return UNEXECUTED builders (the
  * driver contract), so the op never observes the caller's action and
  * can't follow clusterTable's persist→action→unpersist pattern for a
  * table the returned plan still references. Shipped runners (Bench,
  * Verify, Smoke, the shared test fixture) already clear globally via
  * `spark.catalog.clearCache()` between queries; a library caller
  * composing ops calls `release(session)` after its own action instead
  * of accumulating blocks across calls. */
object OpCache {
  private val handles =
    scala.collection.mutable.Map.empty[SparkSession, List[DataFrame]]

  /** Lazily persist `df` and remember the handle for `release`. */
  def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    handles.updateWith(p.sparkSession)(l => Some(p :: l.getOrElse(Nil)))
    p
  }

  /** Unpersist every intermediate tracked for `s`. */
  def release(s: SparkSession): Unit = synchronized {
    handles.remove(s).foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** Scoped variant for callers embedded in a larger session (e.g. a
    * `foreachBatch` body composing ops while the caller holds its own
    * tracked caches): `scope(s)` snapshots the current handle set, and
    * `Scope.release()` unpersists only handles tracked AFTER the
    * snapshot — the caller's pre-existing caches survive. */
  final class Scope private[OpCache] (s: SparkSession,
      baseline: List[DataFrame]) {
    def release(): Unit = OpCache.synchronized {
      val cur = handles.getOrElse(s, Nil)
      val (added, kept) = cur.partition(d => !baseline.exists(_ eq d))
      added.foreach(_.unpersist(blocking = false))
      if (kept.isEmpty) handles.remove(s) else handles(s) = kept
      ()
    }
  }

  def scope(s: SparkSession): Scope = synchronized {
    new Scope(s, handles.getOrElse(s, Nil))
  }
}
