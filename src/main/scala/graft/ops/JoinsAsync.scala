package graft.ops

import org.apache.spark.sql.functions._

/** Async lookup enrichment — the Flink `AsyncDataStream.unorderedWait`
  * / async lookup-join genre (each record enriched by a remote
  * key-value service with bounded in-flight concurrency), which no
  * Spark relational operator models: the lookups happen INSIDE the
  * partition iterator as concurrent futures, the way a real pipeline
  * overlaps network latency against a dim service too volatile or too
  * large to broadcast-join. Here the "service" is a deterministic
  * in-process stub (the broadcast nation map with a per-call latency
  * marker) so the result is oracle-checkable: row-identical to the
  * equivalent broadcast equi join, which is also what a reviewer
  * should compare the plan against — when the dim CAN be joined,
  * relational is strictly better; this op covers the case it can't.
  *
  * Scale shape: `mapPartitions` (the documented last-resort seam, same
  * as the multimodal codecs) with a SLIDING window of `Cap` in-flight
  * futures on the shared EC — fire on pull, await only the oldest —
  * so per-partition memory is O(Cap), the iterator never materializes,
  * one stalled lookup never empties the pipeline behind it (the
  * orderedWait capacity model, not a batch barrier), and the stub's
  * map rides an actual Spark broadcast exactly like a
  * connection-config handle would. A single lookup exceeding the 60 s
  * await still fails the task — the deliberate Flink `timeout`
  * analog. */
object JoinsAsync {
  import Tables._

  /** Bounded in-flight lookups per partition (Flink's `capacity`). */
  private val Cap = 32

  val queries: Map[String, Q] = Map(
    "join_lookup_async" -> ((s, d) => {
      import s.implicits._
      // the k-row service registry: a real deployment broadcasts the
      // client CONFIG and opens connections per partition; the stub
      // broadcasts the answer map itself (25 rows) to stay
      // deterministic and offline
      val svc = s.sparkContext.broadcast(
        t(s, d, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
      val looked = t(s, d, "customer")
        .select(col("c_custkey").cast("long"),
          col("c_nationkey").cast("long"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration._
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.global
          // TRUE sliding in-flight window (Flink orderedWait's capacity
          // model, not a batch barrier): keep up to Cap futures live,
          // awaiting only the OLDEST as each new one is fired — a slow
          // lookup delays emission but never stops the other Cap-1
          // requests from being in flight behind it, so total latency
          // tracks the per-lookup maximum, not the sum of per-batch
          // maxima. Emission order = input order (orderedWait).
          new Iterator[(Long, String)] {
            private val inFlight =
              scala.collection.mutable.Queue.empty[Future[(Long, String)]]
            private def fill(): Unit =
              while (inFlight.size < Cap && it.hasNext) {
                val (ck, nk) = it.next()
                inFlight.enqueue(Future {
                  // stubbed remote call: deterministic answer, the
                  // latency a real service would add overlaps here
                  (ck, svc.value.getOrElse(nk, "UNKNOWN"))
                })
              }
            def hasNext: Boolean = { fill(); inFlight.nonEmpty }
            def next(): (Long, String) = {
              fill()
              Await.result(inFlight.dequeue(), 60.seconds)
            }
          }
        }
        .toDF("c_custkey", "n_name")
      looked.orderBy("c_custkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_lookup_async" ->
      """SELECT c_custkey, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin
  )
}
