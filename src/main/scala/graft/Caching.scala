package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Cache-lifetime helpers for operators that persist an intermediate
  * at an internal fan-out point (the pre-aggregate in [[llm.Corpus]],
  * the fingerprint table in [[llm.DedupLsh.winnowNearDupPairs]], the
  * quantized/assigned frames in [[llm.Similarity.semanticDedup]]).
  * Such a persist cannot be released inside the lazy builder — the
  * returned plan still reads it — so without help the CALLER owns the
  * blocks, and a long-lived session that never calls `clearCache()`
  * leaks one cached intermediate per call.
  *
  * Two closures of that contract:
  *  - [[withCached]] — explicit scope for consumers that materialize
  *    inside it;
  *  - [[releaseAfterFirstUse]] — the default the operators above now
  *    apply: a [[QueryExecutionListener]] watches for the first query
  *    execution WHOSE ANALYZED PLAN CONTAINS THE RETURNED FRAME's plan
  *    (by object identity — every Dataset derived from the returned
  *    frame embeds that exact plan node) and unpersists the
  *    intermediates, then unregisters itself. Re-materializing the
  *    returned frame after that recomputes instead of reading cache —
  *    correct, just uncached — the right trade for fire-once pipeline
  *    operators.
  *
  * Matching the RESULT plan rather than the cached subtrees is what
  * closes the round-7 early-release race: an operator that ran
  * internal actions on the cached frame BEFORE returning (k-means
  * training scans, landzone sink writes) may have those listener
  * events delivered after registration, but those executions were
  * built before the result plan existed and cannot contain it, so
  * they can never release the blocks out from under the consumer.
  * Operators must not materialize the RETURNED frame internally
  * (none do; [[pipeline.Ingest.batchFullLoad]] wraps its cached frame
  * in a fresh projection for exactly this reason).
  *
  * Listener delivery is asynchronous (Spark's execution-listener
  * bus), so release happens shortly after the consumer's first action
  * completes, not synchronously inside it. If the blocks disappear
  * some other way first (external `clearCache()`), the listener
  * notices on the next execution event and unregisters without
  * releasing — it never outlives the blocks it guards, so it cannot
  * accumulate per-call traversal cost or pin the cached frames for
  * the session lifetime.
  */
object Caching {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Run `f`, then unpersist every frame in `cached` — for consumers
    * that materialize the result inside the scope. Non-blocking
    * unpersist; safe on frames that never materialized. */
  def withCached[T](cached: Dataset[_]*)(f: => T): T =
    try f
    finally cached.foreach(_.unpersist(false))

  /** Free a SUPERSEDED checkpoint's storage NOW instead of waiting on
    * the ContextCleaner. `Dataset.unpersist` is a no-op on
    * checkpointed frames (it releases CacheManager entries, and a
    * checkpoint persists its RDD directly without one), so this
    * reaches the `LogicalRDD` the checkpoint wrapped and unpersists
    * the RDD itself. DESTRUCTIVE for a local checkpoint: the blocks
    * are the only copy of the data and lineage is truncated — only
    * call once nothing can read the frame again (the iterative loops'
    * previous-iteration state, dead as soon as the next EAGER
    * checkpoint returns). Reliable-checkpoint FILES are untouched
    * (the ContextCleaner removes them under
    * `spark.cleaner.referenceTracking.cleanCheckpoints`). */
  def dropSupersededCheckpoint(ck: Dataset[_]): Unit =
    ck.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _                                            => ()
    }

  /** Return `result` wired so that the first query execution that
    * reads it (or any frame derived from it) unpersists every frame
    * in `cached`. */
  def releaseAfterFirstUse(result: DataFrame, cached: Dataset[_]*): DataFrame = {
    val spark = result.sparkSession
    if (cached.isEmpty) return result
    // the identity anchor: every consumer Dataset wraps this exact
    // analyzed-plan object (Spark reuses already-analyzed subtrees)
    val resultPlan = result.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
      // The identity anchor assumes the analyzer NEVER copies an
      // already-analyzed subtree. That holds today, but
      // DeduplicateRelations (self-join shapes) or a future Spark
      // could hand the consumer a rewritten COPY — identity would
      // then never match and the cache would pin for the session.
      // Two bounded fallbacks close that leak mode:
      //  - after `IdentityMissLimit` non-matching executions, accept a
      //    STRUCTURALLY identical plan too (`sameResult` canonicalizes
      //    — too costly for every execution, cheap as a fallback);
      //  - after `HardReleaseLimit`, release unconditionally. A
      //    premature release only costs the consumer a recompute
      //    (persist is a cache, lineage is intact — performance, not
      //    correctness), strictly better than pinning blocks forever.
      private val IdentityMissLimit = 32
      private val HardReleaseLimit = 256
      // analyzed is already computed by the time an execution event
      // fires; the try covers exotic failure events where forcing it
      // re-throws — treat as no-match
      private def consumerRead(qe: QueryExecution): Boolean =
        try {
          qe.analyzed.exists(_ eq resultPlan) ||
            (misses.get >= IdentityMissLimit &&
              qe.analyzed.exists(_.sameResult(resultPlan)))
        } catch { case _: Throwable => false }
      private def nothingLeftToRelease: Boolean =
        try cached.forall(_.storageLevel == StorageLevel.NONE)
        catch { case _: Throwable => false }
      private def fire(qe: QueryExecution): Unit =
        if (consumerRead(qe)) {
          if (done.compareAndSet(false, true)) {
            cached.foreach(_.unpersist(false))
            spark.listenerManager.unregister(this)
          }
        } else if (nothingLeftToRelease && done.compareAndSet(false, true)) {
          // blocks already gone (external clearCache, or another hook
          // on the same frames): stop watching instead of paying a
          // plan traversal on every execution forever
          spark.listenerManager.unregister(this)
        } else if (misses.incrementAndGet() >= HardReleaseLimit &&
            done.compareAndSet(false, true)) {
          // identity AND structural match both failed for this many
          // executions: assume the anchor is unreachable and release
          // (see the leak-mode note above — recompute, never pin)
          log.warn(
            s"releaseAfterFirstUse hard-released ${cached.size} cached frame(s) after " +
              s"$HardReleaseLimit executions without observing the consumer plan; " +
              "a later materialization of the operator result will recompute instead of reading cache")
          cached.foreach(_.unpersist(false))
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        fire(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
