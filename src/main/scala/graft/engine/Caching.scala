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
  * inside the scope once the body returns. Outside any scope the
  * behavior is unchanged (persist until session stop), so ad-hoc
  * callers lose nothing.
  *
  * [[persist]] is also idempotent per plan: if the CacheManager already
  * holds this logical plan (e.g. Bench's warm pass inside the same
  * scope), it returns the frame untouched instead of re-registering —
  * which is what silences the repeated-cache warnings.
  */
object Caching {
  private val tracked = ArrayBuffer.empty[DataFrame]

  /** Persist `df` (if its plan isn't already cached) and register it for
    * release at the end of the enclosing [[scoped]] block. */
  def persist(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      tracked += df
      df.persist()
    } else df
  }

  /** Run `body`, then unpersist every frame [[persist]]-ed during it.
    * Nested scopes release only their own registrations. */
  def scoped[T](body: => T): T = {
    val mark = synchronized(tracked.length)
    try body
    finally synchronized {
      tracked.view.drop(mark).foreach(_.unpersist(blocking = false))
      tracked.remove(mark, tracked.length - mark)
    }
  }
}
