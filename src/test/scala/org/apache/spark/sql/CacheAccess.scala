package org.apache.spark.sql

/** Test-only accessor for the private[sql] shared state: the cache
  * hygiene audit asserts that query functions release every DataFrame
  * they `persist()` — a leaked pin survives for the session's life,
  * taxing every later job with its memory + GC footprint (the round-4
  * bench pollution class).
  */
object CacheAccess {
  def cacheIsEmpty(s: SparkSession): Boolean =
    s.sharedState.cacheManager.isEmpty
}
