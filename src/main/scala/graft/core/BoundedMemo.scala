package graft.core

/** Size-bounded LRU memo for the session-lifetime model caches (D1's
  * reduced selection, the BPE merge/word tables, the PQ codebooks).
  *
  * Each of those caches memoizes a small deterministic artifact keyed
  * by a collision-resistant [[Scratch.planKey]] — correct, but a plain
  * `ConcurrentHashMap` grows unboundedly with distinct input plans in
  * a long-lived session and keeps holding references (DataFrames,
  * driver arrays) after their scratch backing could be dropped. This
  * utility bounds every such cache the same way: access-ordered LRU
  * with a hard entry cap, plus an eviction predicate hook so callers
  * holding session-linked values (e.g. a DataFrame whose SparkSession
  * was stopped) can sweep dead entries on the next touch.
  *
  * Computation runs under the memo's lock: the memoized artifacts are
  * train-once models where a duplicate concurrent compute costs far
  * more (a full Spark job) than brief lock contention — the same
  * serialization `computeIfAbsent` gave the previous per-site maps.
  */
final class BoundedMemo[K, V](maxEntries: Int) {
  require(maxEntries > 0, "maxEntries must be positive")

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }

  def getOrElseUpdate(key: K, compute: => V): V = map.synchronized {
    val hit = map.get(key)
    if (hit != null || map.containsKey(key)) hit
    else {
      val v = compute
      map.put(key, v)
      v
    }
  }

  /** Non-computing probe, for call sites whose compute step is too
    * large to run under the memo lock (the PQ training loop): probe,
    * train outside, [[put]]. The lost no-duplicate guarantee only
    * costs a redundant deterministic train on a concurrent miss. */
  def get(key: K): Option[V] = map.synchronized(Option(map.get(key)))

  def put(key: K, value: V): Unit = map.synchronized { map.put(key, value); () }

  /** Drop every entry matching the predicate (dead-session sweep). */
  def evictIf(p: (K, V) => Boolean): Unit = map.synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (p(e.getKey, e.getValue)) it.remove()
    }
  }

  def size: Int = map.synchronized(map.size())

  private[graft] def keysInAccessOrder: Seq[K] = map.synchronized {
    val out = scala.collection.mutable.ArrayBuffer[K]()
    map.keySet().forEach(k => out += k)
    out.toSeq
  }
}
