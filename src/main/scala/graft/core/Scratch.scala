package graft.core

/** Paths for write-once/read-many scratch-parquet intermediates shared
  * across queries in one session (cf. `DomainQueries.futuresBarsCached`,
  * `TextQueries.minhashPairsShared`).
  *
  * The path embeds a full-width md5 of the cache key (two different data
  * dirs can never collide onto one path, unlike a 31-bit `hashCode`) and
  * the JVM's pid, so two concurrent processes benchmarking the same dir
  * never race an overwrite against a read. Scratch is re-derived per
  * process by design — it is a cache, not a store: a JVM shutdown hook
  * removes this pid's dirs, and startup sweeps dirs left by pids that
  * are no longer alive (a crash can't clean up after itself), so
  * repeated bench/verify runs don't leak tmpdir disk without bound.
  */
object Scratch {
  private val jvmTag: String = ProcessHandle.current().pid().toString

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try
        stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
  }

  /** graft_* scratch dirs in tmpdir whose pid suffix matches `keep`. */
  private def scratchDirs(pidFilter: Long => Boolean): Seq[java.nio.file.Path] = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val stream = java.nio.file.Files.list(tmp)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("graft_") && {
          val i = n.lastIndexOf("_p")
          i > 0 && n.drop(i + 2).forall(_.isDigit) && n.length > i + 2 &&
            pidFilter(n.drop(i + 2).toLong)
        }
      }.toSeq
    } finally stream.close()
  }

  locally {
    // sweep dirs orphaned by dead pids (best-effort; a dir another live
    // process owns is never touched), then arrange our own cleanup
    try scratchDirs(pid => ProcessHandle.of(pid).isEmpty).foreach(deleteRecursively)
    catch { case _: java.io.IOException => () }
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try scratchDirs(_ == ProcessHandle.current().pid()).foreach(deleteRecursively)
      catch { case _: java.io.IOException => () },
      "graft-scratch-cleanup"))
  }

  /** Collision-resistant session cache key for a DataFrame input: the
    * SHA-256 of the canonicalized analyzed plan's string form.
    * `semanticHash()` is a 32-bit Int — across many memoized models in
    * one session a collision would silently hand the wrong codebook /
    * merge table to a consumer; the full digest closes that class. The
    * immutable-input contract is unchanged: the plan string covers
    * paths and literals, not file CONTENTS, so a pipeline that rewrites
    * a cached path in place must use a new path (or session).
    */
  def planKey(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.analyzed
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(plan.canonicalized.toString.getBytes("UTF-8"))
    // A LocalRelation's canonical form (and semanticHash) covers its
    // SCHEMA but not its rows — two in-memory inputs of the same shape
    // would otherwise share a key and cross-feed each other's models.
    // File-backed plans are unaffected (path is in the plan string).
    plan.foreach {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        lr.data.foreach(r => md.update(r.toString.getBytes("UTF-8")))
      case _ => ()
    }
    md.digest().map("%02x".format(_)).mkString
  }

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
