package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Contract of the shared cache pool: same tag → same (cached)
  * DataFrame; capacity eviction unpersists the least-recently-used
  * entry instead of leaking it.
  */
class CachePoolSpec extends SparkSpec {

  test("same tag returns the identical cached DataFrame") {
    val a = CachePool.cached(spark, "spec.same") {
      spark.range(10).toDF("n")
    }
    val b = CachePool.cached(spark, "spec.same") {
      fail("builder must not run on a pool hit"); null
    }
    assert(a eq b)
    assert(a.storageLevel != StorageLevel.NONE, "entry must be cached")
    assert(b.count() == 10)
  }

  test("capacity eviction unpersists the LRU entry") {
    val first = CachePool.cached(spark, "spec.evict.0") {
      spark.range(5).toDF("n")
    }
    first.count() // materialize so unpersist is observable
    assert(first.storageLevel != StorageLevel.NONE)
    // flood the pool past capacity with fresh tags; the oldest entry
    // (spec.evict.0, never re-accessed) must be evicted + unpersisted
    (1 to 150).foreach { i =>
      CachePool.cached(spark, s"spec.evict.$i") {
        spark.range(i.toLong).toDF("n")
      }
    }
    assert(first.storageLevel == StorageLevel.NONE,
      "evicted entry should be unpersisted")
    // NOTE: this spec floods the pool, so operator entries from other
    // suites may re-derive once afterwards — correctness unaffected
  }
}
