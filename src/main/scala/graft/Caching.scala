package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.util.QueryExecutionListener

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
  *    execution that read any of the operator's cached intermediates
  *    (matched by their `CachedRDDBuilder` identity in the optimized
  *    plan — the builder instance is shared by every plan the cache
  *    manager substitutes it into) and unpersists them all, then
  *    unregisters itself. Re-materializing the returned frame after
  *    that recomputes instead of reading cache — correct, just
  *    uncached — which is the right trade for fire-once pipeline
  *    operators.
  *
  * Listener delivery is asynchronous (Spark's execution-listener bus),
  * so release happens shortly after the action completes, not
  * synchronously inside it. One benign race: an operator that ran
  * internal actions on the cached frame BEFORE returning (k-means
  * training, landzone sink writes) may have those events delivered
  * after the listener registers, releasing the blocks before the
  * consumer's first action — the consumer then recomputes instead of
  * reading cache; results are never affected.
  */
object Caching {

  /** Run `f`, then unpersist every frame in `cached` — for consumers
    * that materialize the result inside the scope. Non-blocking
    * unpersist; safe on frames that never materialized. */
  def withCached[T](cached: Dataset[_]*)(f: => T): T =
    try f
    finally cached.foreach(_.unpersist(false))

  /** Return `result` wired so that the first query execution touching
    * any of `cached` (normally: the consumer's first action on
    * `result`) unpersists them all. If nothing in `cached` is actually
    * registered in the cache manager, `result` is returned unwired. */
  def releaseAfterFirstUse(result: DataFrame, cached: Dataset[_]*): DataFrame = {
    val spark = result.sparkSession
    // the cache manager substitutes a copy of the InMemoryRelation into
    // every plan that matches the cached subtree, but the copy shares
    // the CachedRDDBuilder instance — identity on it recognizes "this
    // execution read that cache" across all downstream plans
    // typed AnyRef: CachedRDDBuilder itself is sql-private, but the
    // accessor is public and identity is all the match needs
    val builders: Seq[AnyRef] = cached.flatMap { c =>
      c.queryExecution.withCachedData.collectFirst {
        case r: InMemoryRelation => r.cacheBuilder: AnyRef
      }
    }
    if (builders.isEmpty) return result
    val listener = new QueryExecutionListener {
      private val released = new AtomicBoolean(false)
      private def touchesCache(qe: QueryExecution): Boolean =
        // optimizedPlan is lazy: on an onFailure event from an
        // analysis-time error, forcing it re-throws — treat as no-match
        try qe.optimizedPlan.exists {
          case r: InMemoryRelation => builders.exists(_ eq (r.cacheBuilder: AnyRef))
          case _                   => false
        } catch { case _: Throwable => false }
      private def fire(qe: QueryExecution): Unit =
        if (touchesCache(qe) && released.compareAndSet(false, true)) {
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
