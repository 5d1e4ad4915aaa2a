package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache-lifetime discipline for the library's internal `persist()` calls.
  *
  * Library operators persist frames their plans reference more than once
  * (see the scaladoc on each call site). Those caches must outlive the
  * function that created them — the consuming action is the caller's — so
  * they cannot be unpersisted before returning. `releaseAfterAction`
  * registers a one-shot listener that unpersists them as soon as the next
  * SQL action on the session completes (success or failure): the usual
  * one-action consumers (a write, a count, a collect) pay nothing and leak
  * nothing. A caller that runs several actions over the same returned frame
  * recomputes after the first — correct (the plans are deterministic,
  * `repartitionByRange` boundaries included, because repeated actions on
  * one DataFrame reuse its physical RDD), just uncached; such callers
  * should persist the *returned* frame themselves.
  *
  * CONCURRENCY CONTRACT: "the next action" means the next action on the
  * WHOLE session — the listener cannot tell the consuming action from an
  * unrelated one. A session shared by concurrent threads (a notebook
  * with parallel cells, a ThriftServer) can release a cache early (the
  * consumer then recomputes — slower, never wrong) and a caller that
  * never runs an action leaves cache + listener registered until
  * `clearCaches`. The engine's own entry points (Verify/Bench/Demo) are
  * single-action-at-a-time by construction.
  *
  * `clearCaches` is the blunt escape hatch for long-lived sessions.
  */
object Caches {

  /** Unpersist `dfs` after the next completed action on their session. */
  def releaseAfterAction(dfs: DataFrame*): Unit = {
    if (dfs.isEmpty) return
    val spark = dfs.head.sparkSession
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private def release(): Unit =
        if (done.compareAndSet(false, true)) {
          dfs.foreach { df =>
            try df.unpersist(blocking = false)
            catch { case _: Throwable => () }
          }
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = release()
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = release()
    }
    spark.listenerManager.register(listener)
  }

  /** Unpersist `dfs` once the session has no active streaming queries
    * left — the streaming twin of [[releaseAfterAction]]. A stream-static
    * join's cached static side (the banded minhash reference, an index
    * artifact) must live for the WHOLE streaming query, not one action,
    * so the release trigger is a query-terminated event with no other
    * query still active. Same blunt-but-safe contract as the batch
    * listener: a session running several concurrent streaming queries
    * releases only when the last one stops (caches live longer than
    * strictly needed, never shorter), and repeated builder calls each
    * release their own frames at that point instead of accumulating for
    * the session's lifetime.
    *
    * The trigger ARMS only once a query STARTED AFTER registration has
    * been observed: builders register during plan construction, before
    * the caller wires a sink and calls start(), and a pre-existing
    * unrelated query terminating in that gap must not release a cache
    * whose consumer hasn't begun. Once armed, ANY termination that
    * leaves the session with no active queries releases — including a
    * pre-existing query's (r13 ADVICE: keying the release to post-
    * registration ids alone leaked permanently when the builder's own
    * query ended first and a pre-existing one terminated last). The
    * remaining documented gap is benign-by-construction: an unrelated
    * post-registration query starting AND terminating before the
    * builder's consumer begins releases early, and the consumer then
    * recomputes its static side per micro-batch — slower, never wrong.
    * One-shot by design — a caller that stops and restarts the same
    * plan gets a recomputed (uncached) static side on the second run;
    * re-invoke the builder for a fresh cache + release. */
  def releaseAfterStreams(dfs: DataFrame*): Unit = {
    if (dfs.isEmpty) return
    val spark = dfs.head.sparkSession
    val preexisting = spark.streams.active.map(_.id).toSet
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      private val done = new AtomicBoolean(false)
      private val armed = new AtomicBoolean(false)
      override def onQueryStarted(event: QueryStartedEvent): Unit =
        if (!preexisting.contains(event.id)) armed.set(true)
      override def onQueryProgress(event: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
        // a post-registration id terminating implies it started — arm even
        // if the started event raced past before this listener registered
        if (!preexisting.contains(event.id)) armed.set(true)
        if (armed.get && spark.streams.active.isEmpty &&
            done.compareAndSet(false, true)) {
          dfs.foreach { df =>
            try df.unpersist(blocking = false)
            catch { case _: Throwable => () }
          }
          spark.streams.removeListener(this)
        }
      }
    }
    spark.streams.addListener(listener)
  }

  /** Immediately drop a frame's storage blocks, whether it was
    * `persist()`-ed (CacheManager path) or `localCheckpoint`-ed — a
    * checkpointed frame's blocks live on the checkpoint's internal RDD
    * (the `LogicalRDD` leaf), which the CacheManager never sees, so
    * `Dataset.unpersist` is a silent no-op there (r16 ADVICE). Iterative
    * operators call this on each PREVIOUS round's frame once the next
    * round has materialized, keeping peak storage at O(1) frames instead
    * of O(rounds).
    *
    * ONLY safe on frames no live plan references again: checkpoint
    * blocks are not recomputable (lineage is truncated), so a later
    * action on a released frame fails instead of recomputing. */
  def releaseBlocks(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.unpersist(blocking = false)
    case _ => df.unpersist(blocking = false)
  }

  /** Drop every cached frame in the session (documented escape hatch for
    * long-lived sessions mixing many library calls). */
  def clearCaches(spark: SparkSession): Unit = spark.catalog.clearCache()
}
