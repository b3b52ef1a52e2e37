package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Histogram-only probe of the LSH ladder shapes: for each candidate
  * band shape, print the two-tier cap selection and the capped
  * candidate mass Σ C(n,2) on a corpus — the budget walk's own
  * measurements, without running any pair pipeline. Reads the corpus
  * once (identity collapse + one fused signature pass at the widest
  * shape, per-component prefix slicing for the narrower ones).
  *
  * Usage: runMain graft.tools.MassProbe dir [dir...]
  */
object MassProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val shapes = Seq(
      graft.operators.Dedup.lshAutoShape(0.4, 0.99, 64),
      graft.operators.Dedup.lshAutoShape(0.4, 0.95, 64))
    val maxHashes = shapes.map { case (r, b) => r * b }.max
    // Decorrelation experiment: K-M components min_s(h1 + k·h2) share
    // their argmin shingle across adjacent k (the linear family is
    // monotone-ish in k), so r-row bands discriminate like ~1 row.
    // Scrambling each combined value with splitmix64 BEFORE the min
    // makes each component an effectively independent permutation.
    val scramble = sys.env.get("SPARK_GRAFT_MASS_SCRAMBLE").contains("1")
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val scrambledSig = udf { (text: String, numHashes: Int) =>
      val sig = Array.fill(numHashes)(Long.MaxValue)
      if (text != null) {
        val n = math.max(text.length - 5 + 1, 1)
        val seen = new java.util.HashSet[String](n * 2)
        var i = 0
        while (i < n) {
          val s = text.substring(i, math.min(i + 5, text.length))
          if (seen.add(s)) {
            val (h1, h2) = graft.functions.Md5Hash.h1h2(s)
            var k = 0
            while (k < numHashes) {
              val h = mix(h1 + k * h2)
              if (h < sig(k)) sig(k) = h
              k += 1
            }
          }
          i += 1
        }
      }
      sig
    }
    for (d <- dirs) {
      val docs = graft.core.Tables.documents(spark, d)
      val norm = udf { t: String =>
        if (t == null) null
        else t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ") }
      val reps = docs
        .select(col("doc_id"), norm(col("text")).as("__norm"))
        .filter(col("__norm").isNotNull)
        .groupBy(col("__norm")).agg(min(col("doc_id")).as("__id"))
      val sigs = (if (scramble)
          reps.select(col("__id"),
            scrambledSig(col("__norm"), lit(maxHashes)).as("sig"))
        else
          reps.select(col("__id"),
            graft.operators.Dedup.sigAndHashedShingles(5, maxHashes)(col("__norm"))
              .getField("_1").as("sig")))
        .persist()
      val nReps = sigs.count()
      println(s"[mass] $d reps=$nReps budget64=${64L * nReps}")
      for ((r, b) <- shapes) {
        val banded = sigs.select(col("__id"),
          posexplode(array((0 until b).map { bb =>
            xxhash64(slice(col("sig"), bb * r + 1, r)
              .cast("array<string>").cast("string"))
          }: _*)).as(Seq("band", "band_hash")))
        val bsz = banded.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("__n")).persist()
        bsz.count()
        val hist = bsz.groupBy(col("__n")).agg(count(lit(1)).as("__m"))
          .orderBy(col("__n")).collect()
          .map(x => (x.getLong(0), x.getLong(1)))
        // two-tier cap over distinct sizes (mirrors Dedup.autoBucketCap)
        val ds = hist.map(_._1)
        val gaps = ds.zip(ds.drop(1)).filter(_._1 >= 16)
        val cap =
          if (gaps.isEmpty) ds.lastOption.getOrElse(1L)
          else {
            val knee = gaps.maxBy { case (n, nx) => (nx.toDouble / n, n) }
            if (knee._2.toDouble / knee._1 >= 1.5) knee._1
            else gaps.maxBy { case (n, nx) => (nx - n, n) }._1
          }
        def massUpTo(c: Long): Long =
          hist.filter(_._1 <= c).map { case (n, m) => n * (n - 1) / 2 * m }.sum
        val top = hist.takeRight(8).map { case (n, m) => s"$n*$m" }.mkString(",")
        println(s"[mass] $d shape=(${r}x$b) cap=$cap mass_capped=${massUpTo(cap)} " +
          s"mass_all=${massUpTo(Long.MaxValue)} distinct_sizes=${ds.length} top=[$top]")
        bsz.unpersist()
      }
      sigs.unpersist()
    }
    spark.stop()
  }
}
