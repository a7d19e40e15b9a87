package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GateCache

/** GateCache's session-scoped keying: the same gate key used from two
  * live sessions must never collide (a collision would unpersist the
  * other session's working set), while a same-session re-registration
  * must release the previous handle. Stopped-session eviction runs on
  * every swap against `sparkContext.isStopped`; it cannot be exercised
  * here without killing the suite's shared context, but the identity
  * keying this spec pins is what makes that eviction safe to rely on.
  */
class GateCacheSpec extends AnyFunSuite {

  test("same key in two sessions doesn't collide; same-session swap releases") {
    val a = TestSpark.spark.newSession()
    val b = TestSpark.spark.newSession()
    // distinct row counts: the shared CacheManager matches cache
    // entries by PLAN equality, so two sessions caching the same
    // literal plan would alias each other and fake a collision
    val dfA = a.range(100).toDF("x").persist()
    dfA.count()
    val dfB = b.range(150).toDF("x").persist()
    dfB.count()

    GateCache.swap("gatecache_spec", dfA)
    GateCache.swap("gatecache_spec", dfB)
    assert(dfA.storageLevel.useMemory,
      "registering the same key from session B unpersisted session A's df")

    val dfA2 = a.range(200).toDF("x").persist()
    dfA2.count()
    GateCache.swap("gatecache_spec", dfA2)
    assert(!dfA.storageLevel.useMemory,
      "same-session re-registration must release the previous handle")
    assert(dfA2.storageLevel.useMemory && dfB.storageLevel.useMemory)

    // cleanup
    dfA2.unpersist(false)
    dfB.unpersist(false)
  }
}
