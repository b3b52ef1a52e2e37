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

  /** Materialize a (typically `persist()`-pinned) DataFrame to scratch
    * parquet, release the in-memory copy, and return the parquet-backed
    * read. This is the standard release point for operators that return
    * persisted results ([[graft.operators.Dedup.minHashDupPairs]],
    * [[graft.analytics.ContinuousFutures.continuousSeries]]): holding
    * the cache for the session's life pins executor memory and builds GC
    * pressure that taxes every LATER job in the session — the parquet
    * copy costs one small write and is re-readable at full parallelism.
    */
  def materialize(df: org.apache.spark.sql.DataFrame, kind: String,
      key: String): org.apache.spark.sql.DataFrame = {
    val p = path(kind, key)
    df.write.mode("overwrite").parquet(p)
    df.unpersist()
    df.sparkSession.read.parquet(p)
  }
}
