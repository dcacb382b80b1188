package graft

import graft.engine.Caching
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CountDownLatch, TimeUnit}

class CachingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshFrame(tag: String) =
    Seq((tag, 1), (tag, 2), (tag, 3)).toDF("k", "v").filter($"v" > 0)

  test("scoped persist is released at scope end; unscoped persist is not touched") {
    val inScope = freshFrame("scoped-release")
    val outside = freshFrame("outside-owner")
    Caching.persist(outside) // unscoped: caller owns it
    outside.count()
    Caching.scoped {
      Caching.persist(inScope)
      inScope.count()
      assert(inScope.storageLevel != StorageLevel.NONE)
    }
    assert(inScope.storageLevel == StorageLevel.NONE, "scope did not release")
    assert(outside.storageLevel != StorageLevel.NONE, "scope dropped an unscoped cache")
    outside.unpersist()
  }

  test("persist inside a scope is idempotent per plan (warm+timed double registration)") {
    Caching.scoped {
      val a = freshFrame("idem")
      val b = freshFrame("idem") // same canonical plan
      Caching.persist(a)
      Caching.persist(b)
      a.count()
      assert(a.storageLevel != StorageLevel.NONE)
    }
    assert(freshFrame("idem").storageLevel == StorageLevel.NONE)
  }

  test("a cache shared by two threads' scopes survives the first scope's exit") {
    // Thread A persists the plan, signals B, and closes its scope only
    // after B has persisted the SAME plan in its own scope. Under the
    // old storageLevel-dedup behavior, A's scope-end unpersisted the
    // cache B's in-flight query still read; ref-counting keeps it live
    // until BOTH scopes close.
    val aRegistered = new CountDownLatch(1)
    val bRegistered = new CountDownLatch(1)
    val bScopeDone = new CountDownLatch(1)
    @volatile var liveAfterAClosed: Boolean = false
    @volatile var liveAfterBClosed: Boolean = true

    val threadA = new Thread(() => Caching.scoped {
      val dfA = freshFrame("xthread")
      Caching.persist(dfA)
      dfA.count()
      aRegistered.countDown()
      assert(bRegistered.await(30, TimeUnit.SECONDS))
    }) // A's scope closes here, releasing one of the two refs
    val threadB = new Thread(() => {
      assert(aRegistered.await(30, TimeUnit.SECONDS))
      Caching.scoped {
        val dfB = freshFrame("xthread")
        Caching.persist(dfB)
        bRegistered.countDown()
        threadA.join(30000)
        liveAfterAClosed = dfB.storageLevel != StorageLevel.NONE
      }
      liveAfterBClosed = freshFrame("xthread").storageLevel != StorageLevel.NONE
      bScopeDone.countDown()
    })
    threadA.start(); threadB.start()
    assert(bScopeDone.await(60, TimeUnit.SECONDS))
    threadA.join(); threadB.join()
    assert(liveAfterAClosed, "first scope's exit dropped a cache the second scope still held")
    assert(!liveAfterBClosed, "last scope's exit failed to release the shared cache")
  }
}
