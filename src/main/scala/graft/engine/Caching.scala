package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Lifecycle tracking for operator-internal `persist()` calls.
  *
  * Operators like [[graft.ops.ext.Dedup.minhashPairs]] persist an
  * intermediate (the shingle table, the band buckets) that several
  * branches of the SAME returned plan re-read. Because the operator
  * returns a *lazy* DataFrame, it cannot unpersist in its own scope —
  * the cache would be dropped before the consumer's first action ever
  * populates it. Left alone, each invocation re-registers the same plan
  * with the CacheManager ("Asked to cache already cached data" warnings)
  * and the entries accumulate in executor storage until eviction
  * pressure — the classic long-running-app leak.
  *
  * The contract here: operators route internal persists through
  * [[persist]], and whoever MATERIALIZES the result (Verify's write,
  * Bench's count, an embedding application's action) wraps the
  * build-and-run in [[scoped]], which releases everything registered
  * inside that scope once the body returns.
  *
  * Cross-thread sharing is REF-COUNTED per canonicalized logical plan:
  * when two concurrent scopes (e.g. parallel query runners sharing one
  * SparkSession) persist the same plan, each registers a reference and
  * the cache is only unpersisted when the LAST scope holding it closes —
  * one thread finishing never drops a cache another thread's in-flight
  * query still reads. The registry lookup and the `persist()` call
  * happen under one lock, so two racing scopes cannot both miss and
  * double-register either.
  *
  * Outside any scope, [[persist]] is a plain idempotent `df.persist()`
  * with no registration at all (nothing retains the frame, so un-scoped
  * long-running callers don't accumulate references here either — they
  * own their cache lifetimes, as before). A plan some OUTSIDE party
  * already cached (storage level set but no registry entry) is likewise
  * left alone: scoped callers reuse it but never adopt its lifetime.
  */
object Caching {
  private val lock = new Object
  // canonicalized plan -> (a frame holding the cache, open-scope refs)
  private val refs = mutable.HashMap.empty[LogicalPlan, (DataFrame, Int)]
  // stack of open scopes for the current thread; innermost last
  private val scopes: ThreadLocal[ArrayBuffer[ArrayBuffer[LogicalPlan]]] =
    ThreadLocal.withInitial(() => ArrayBuffer.empty[ArrayBuffer[LogicalPlan]])

  /** Persist `df` (if its plan isn't already cached) and, when a scope
    * is open on this thread, take a ref-counted registration released at
    * scope end. */
  def persist(df: DataFrame): DataFrame = {
    val st = scopes.get()
    if (st.isEmpty) {
      // unscoped: idempotent persist, caller owns the lifetime
      if (df.storageLevel != StorageLevel.NONE) df else df.persist()
    } else lock.synchronized {
      val key = df.queryExecution.analyzed.canonicalized
      refs.get(key) match {
        case Some((holder, n)) => // live in some scope: share, add a ref
          refs(key) = (holder, n + 1)
          st.last += key
          df
        case None if df.storageLevel != StorageLevel.NONE =>
          df // cached by an outside party — reuse, don't adopt
        case None =>
          df.persist()
          refs(key) = (df, 1)
          st.last += key
          df
      }
    }
  }

  /** Run `body`, then release every registration [[persist]] took during
    * it on this thread; a cache is unpersisted only when its LAST
    * registration across all scopes is released. Nested scopes release
    * only their own registrations. */
  def scoped[T](body: => T): T = {
    val st = scopes.get()
    val mine = ArrayBuffer.empty[LogicalPlan]
    st += mine
    try body
    finally {
      st.remove(st.length - 1)
      lock.synchronized {
        mine.foreach { key =>
          refs.get(key) match {
            case Some((holder, 1)) =>
              refs.remove(key)
              holder.unpersist(blocking = false)
            case Some((holder, n)) =>
              refs(key) = (holder, n - 1)
            case None => // released by a bug elsewhere; nothing to do
          }
        }
      }
    }
  }
}
