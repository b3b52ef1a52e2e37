package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-size probe of the budgeted LSH pipeline's tail shape: counts
  * the capped raw candidate stream and the est-prefilter survivors at
  * several cutoffs — the numbers that decide how the verify tail must
  * be staged at scale. Histogram/candidate work only; never joins
  * shingle arrays.
  *
  * Usage: runMain graft.tools.StageProbe dir [dir...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val (r, b) = graft.operators.Dedup.lshAutoShape(0.4, 0.95, 64)
    val nh = r * b
    val eqCount = udf { (a: Seq[Long], bb: Seq[Long]) =>
      var i = 0; var eq = 0
      val n = math.min(a.length, bb.length)
      while (i < n) { if (a(i) == bb(i)) eq += 1; i += 1 }
      eq
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
      val perDoc = reps.select(col("__id"),
        graft.operators.Dedup.sigAndHashedShingles(5, nh)(col("__norm")).as("__c"))
        .select(col("__id"), col("__c._1").as("sig"),
          size(col("__c._2")).as("nsh"))
        .persist()
      val nReps = perDoc.count()
      val shBytes = perDoc.agg(sum(col("nsh"))).head().getLong(0) * 8L
      println(s"[stage] $d reps=$nReps shingleBytes=$shBytes " +
        s"sigBytes=${nReps * nh * 8L}")
      val banded = perDoc.select(col("__id"),
        posexplode(array((0 until b).map { bb =>
          xxhash64(slice(col("sig"), bb * r + 1, r)
            .cast("array<string>").cast("string"))
        }: _*)).as(Seq("band", "band_hash")))
      // budget cap at the default budget
      val budget = graft.operators.Dedup.DefaultBudgetPairsPerRep * nReps
      val hist = banded.groupBy(col("band"), col("band_hash"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("__n")).agg(count(lit(1)).as("__m"))
        .orderBy(col("__n")).collect().map(x => (x.getLong(0), x.getLong(1)))
      var cum = 0L; var cap = 1L; var i = 0; var over = false
      while (i < hist.length && !over) {
        val (n, m) = hist(i)
        cum += n * (n - 1) / 2 * m
        if (cum <= budget) cap = n else over = true
        i += 1
      }
      println(s"[stage] $d shape=(${r}x$b) budget=$budget cap=$cap")
      val ok = banded.groupBy(col("band"), col("band_hash"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") <= cap)
        .drop("__n")
      val kept = banded.join(ok, Seq("band", "band_hash"), "left_semi")
      val candRaw = kept.select(col("band"), col("band_hash"), col("__id").as("id_a"))
        .join(kept.select(col("band"), col("band_hash"), col("__id").as("id_b")),
          Seq("band", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val sigOnly = broadcast(perDoc.select(col("__id"), col("sig")))
      val est = candRaw
        .join(sigOnly.select(col("__id").as("id_a"), col("sig").as("sa")), Seq("id_a"))
        .join(sigOnly.select(col("__id").as("id_b"), col("sig").as("sb")), Seq("id_b"))
        .select(eqCount(col("sa"), col("sb")).as("eq"))
        .persist()
      val nCand = est.count()
      for (cut <- Seq(0.15, 0.25, 0.30, 0.35)) {
        val k = math.ceil(cut * nh).toInt
        val surv = est.filter(col("eq") >= k).count()
        println(s"[stage] $d candRaw=$nCand cutoff=$cut (eq>=$k) survivors=$surv")
      }
      est.unpersist(); perDoc.unpersist()
    }
    spark.stop()
  }
}
