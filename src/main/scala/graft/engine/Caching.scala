package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

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
  * build-and-run in [[scoped]], which unpersists everything registered
  * inside that scope once the body returns.
  *
  * Scopes are THREAD-LOCAL: concurrent callers (e.g. parallel query
  * runners sharing one SparkSession) each release exactly the frames
  * their own scope persisted — one thread finishing never touches
  * another thread's live caches. Outside any scope, [[persist]] is a
  * plain `df.persist()` with no registration at all (nothing retains
  * the frame, so un-scoped long-running callers don't accumulate
  * references here either — they own their cache lifetimes, as
  * before).
  *
  * [[persist]] is also idempotent per plan: if the CacheManager already
  * holds this logical plan (e.g. Bench's warm pass inside the same
  * scope), it returns the frame untouched instead of re-registering —
  * which is what silences the repeated-cache warnings.
  */
object Caching {
  // stack of open scopes for the current thread; innermost last
  private val scopes: ThreadLocal[ArrayBuffer[ArrayBuffer[DataFrame]]] =
    ThreadLocal.withInitial(() => ArrayBuffer.empty[ArrayBuffer[DataFrame]])

  /** Persist `df` (if its plan isn't already cached) and, when a scope
    * is open on this thread, register it for release at scope end. */
  def persist(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val st = scopes.get()
      if (st.nonEmpty) st.last += df
      df.persist()
    }

  /** Run `body`, then unpersist every frame [[persist]]-ed during it on
    * this thread. Nested scopes release only their own registrations. */
  def scoped[T](body: => T): T = {
    val st = scopes.get()
    val mine = ArrayBuffer.empty[DataFrame]
    st += mine
    try body
    finally {
      st.remove(st.length - 1)
      mine.foreach(_.unpersist(blocking = false))
    }
  }
}
