package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: time the futuresBars DAG plain vs persisted, to pin down
  * the cache-build cost observed in the round-4 bench.
  */
object ProfileBars {
  // the exact production DAG — a copy here would silently drift
  private def futuresBars(s: SparkSession, d: String): DataFrame =
    graft.queries.DomainQueries.futuresBars(s, d)

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "profile")
    spark.sparkContext.setLogLevel("WARN")
    time("plain count")(futuresBars(spark, d).count())
    time("plain count again")(futuresBars(spark, d).count())
    val p0 = futuresBars(spark, d).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    time("persist MEMORY_ONLY fill (first)")(p0.count())
    p0.unpersist()
    val p = futuresBars(spark, d).persist()
    time("persist fill count")(p.count())
    time("read from cache count")(p.count())
    time("scan from cache")(
      graft.analytics.ContinuousFutures.dailySelection(spark, p).count())
    p.unpersist()
    val p2 = futuresBars(spark, d).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    time("persist MEMORY_ONLY fill")(p2.count())
    time("scan from mem cache")(
      graft.analytics.ContinuousFutures.dailySelection(spark, p2).count())
    p2.unpersist()
    time("scan no cache")(
      graft.analytics.ContinuousFutures.dailySelection(spark, futuresBars(spark, d)).count())
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_profile_bars"
    time("write parquet")(futuresBars(spark, d).write.mode("overwrite").parquet(tmp))
    time("scan from parquet")(
      graft.analytics.ContinuousFutures.dailySelection(spark, spark.read.parquet(tmp)).count())
    time("scan from parquet again")(
      graft.analytics.ContinuousFutures.dailySelection(spark, spark.read.parquet(tmp)).count())
    spark.stop()
  }
}
