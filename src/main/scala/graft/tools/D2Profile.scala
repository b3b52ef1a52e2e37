package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off phase-timing probe for the d2 sliced factor scan: attributes
  * wall time across (bars build, reduction materialize, boundary pass,
  * sliced replay, full adjFactors) so scaling work targets the real
  * bottleneck instead of the guessed one.
  *
  * Usage: runMain graft.tools.D2Profile <sfDir>
  */
object D2Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d2profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("session warm-up (dummy job)") {
      // first-job overhead (codegen, committer init) lands here, not on
      // a measured phase
      val path = graft.core.Scratch.path("bars_probe0", dir)
      graft.queries.DomainQueries.futuresBars(spark, dir)
        .write.mode("overwrite").parquet(path)
    }
    val bars = timed("bars materialize") {
      val path = graft.core.Scratch.path("bars_probe", dir)
      graft.queries.DomainQueries.futuresBars(spark, dir)
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    timed("reduceFull materialize") {
      graft.analytics.ContinuousFutures.probeReduce(spark, bars)
    }
    timed("2a boundary pass (count)") {
      println("  seeds=" + graft.analytics.ContinuousFutures.probeSeeds(spark, bars))
    }
    timed("2b replay events (count)") {
      println("  events=" + graft.analytics.ContinuousFutures.probeEvents(spark, bars))
    }
    timed("full adjFactors (count)") {
      println("  rows=" + graft.analytics.ContinuousFutures
        .adjFactors(spark, bars, graft.analytics.ContinuousFutures.Diff).count())
    }
    timed("serial adjFactorsSerial") {
      println("  rows=" + graft.analytics.ContinuousFutures
        .adjFactorsSerial(spark, bars, graft.analytics.ContinuousFutures.Diff).count())
    }
    spark.stop()
  }
}
