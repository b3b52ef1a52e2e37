package graft.core

/** Paths for write-once/read-many scratch-parquet intermediates shared
  * across queries in one session (cf. `DomainQueries.futuresBarsCached`,
  * `TextQueries.minhashPairsShared`).
  *
  * The path embeds a full-width md5 of the cache key (two different data
  * dirs can never collide onto one path, unlike a 31-bit `hashCode`) and
  * the JVM's pid, so two concurrent processes benchmarking the same dir
  * never race an overwrite against a read. Scratch is re-derived per
  * process by design — it is a cache, not a store.
  */
object Scratch {
  private val jvmTag: String = ProcessHandle.current().pid().toString

  def path(kind: String, key: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_${h}_p$jvmTag"
  }
}
