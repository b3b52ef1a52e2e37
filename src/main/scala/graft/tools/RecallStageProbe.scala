package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-mass decomposition of dd_lsh_recall_report's comparison
  * operating points: per point, the capped raw candidate count, the
  * est-prefilter survivor count, and the verified pair count — the
  * numbers that locate the sf1m wall inside the pipeline (candidate
  * join vs est vs verify).
  *
  * Usage: runMain graft.tools.RecallStageProbe [dir]
  */
object RecallStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[recall-stage] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = graft.core.Tables.documents(spark, dir)
    val norm = udf { t: String =>
      if (t == null) null
      else t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ") }
    val maxNh = 64
    val reps = docs
      .select(col("doc_id"), norm(col("text")).as("__norm"))
      .filter(col("__norm").isNotNull)
      .groupBy(col("__norm")).agg(min(col("doc_id")).as("__id"))
    val perDoc = reps.select(col("__id"),
      Dedup.sigAndHashedShingles(5, maxNh)(col("__norm")).as("__c"))
      .select(col("__id"), col("__c._1").as("sig"), col("__c._2").as("sh"))
      .persist()
    val nReps = timed("collapse+sig")(perDoc.count())
    println(s"[recall-stage] $dir reps=$nReps")
    // Hashed-shingle exact PPJoin over rep space (the candidate H-set
    // kernel): prefix filter + positional filter + two-pointer verify,
    // all over the already-hashed sorted long sets.
    locally {
      val tau = 0.4
      def ceilSlack(x: org.apache.spark.sql.Column) = ceil(x - lit(1e-9))
      val sets = perDoc.select(col("__id"), col("sh"))
        .withColumn("__n", size(col("sh"))).filter(col("__n") > 0)
      val grams = sets.select(col("__id"), col("__n"),
        explode(col("sh")).as("__g"))
      val dfc = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__id").orderBy(col("__df"), col("__g"))
      val prefixes = grams.join(dfc, "__g")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= col("__n") - ceilSlack(lit(tau) * col("__n")) + 1)
        .select(col("__g"), col("__id"), col("__n"), col("__rk"))
      val pa = prefixes.select(col("__g"), col("__id").as("id_a"),
        col("__n").as("na"), col("__rk").as("ra"))
      val pb = prefixes.select(col("__g"), col("__id").as("id_b"),
        col("__n").as("nb"), col("__rk").as("rb"))
      // Enumerated join mass: rows the per-gram self-join materializes
      // BEFORE any filter — Σ_g C(c_g, 2) over prefix-gram counts.
      val gramHist = prefixes.groupBy("__g").agg(count(lit(1)).as("__c"))
        .persist()
      val enumMass = timed("hashedExact enumerated mass")(
        gramHist.agg(sum(col("__c") * (col("__c") - 1) / 2).cast("long")).head().getLong(0))
      // Stratified enumerated mass: per (gram, length band), pairs only
      // against bands b-1..b+1 — the length filter pushed into the key.
      // band = floor(log(n) / log(1/tau)); computed here loosely (probe
      // only — the real filter stays exact).
      val band = floor(log(col("__n").cast("double")) / math.log(1.0 / tau))
      val gb = prefixes.withColumn("__b", band)
        .groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
      val self = gb.agg(sum(col("__c") * (col("__c") - 1) / 2).cast("long")).head().getLong(0)
      val adj = gb.as("x").join(gb.as("y"),
          col("x.__g") === col("y.__g") && col("y.__b") === col("x.__b") + 1)
        .agg(sum(col("x.__c") * col("y.__c")).cast("long")).head()
      val adjMass = if (adj.isNullAt(0)) 0L else adj.getLong(0)
      println(s"[recall-stage] hashedExact enumMass=$enumMass " +
        s"stratified=${self + adjMass} (self=$self adj=$adjMass)")
      gramHist.unpersist()
      val alpha0 = ceilSlack(lit(tau / (1.0 + tau)) * (col("na") + col("nb")))
      val passPreDistinct = pa.join(pb, Seq("__g"))
        .filter(col("id_b") > col("id_a") &&
          col("nb") >= ceilSlack(lit(tau) * col("na")) &&
          col("nb") * tau <= col("na") + lit(1e-9) &&
          lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha0)
        .count()
      println(s"[recall-stage] hashedExact filterPass(preDistinct)=$passPreDistinct")
      val alpha = ceilSlack(lit(tau / (1.0 + tau)) * (col("na") + col("nb")))
      val candidates = pa.join(pb, Seq("__g"))
        .filter(col("id_b") > col("id_a") &&
          col("nb") >= ceilSlack(lit(tau) * col("na")) &&
          col("nb") * tau <= col("na") + lit(1e-9) &&
          lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >= alpha)
        .select("id_a", "id_b").distinct().persist()
      val nCand = timed("hashedExact candidates")(candidates.count())
      // Candidate-local verify (lookup probe, not array joins): the
      // production staging.
      val lrows = perDoc.select(col("__id"), col("sh")).collect()
      java.util.Arrays.sort(lrows, java.util.Comparator.comparingLong(
        (r: org.apache.spark.sql.Row) => r.getLong(0)))
      val ids = lrows.map(_.getLong(0))
      val shs = lrows.map(_.getSeq[Long](1).toArray)
      val bl = spark.sparkContext.broadcast((ids, shs))
      val jac = udf { (ia: Long, ib: Long) =>
        val (bids, bshs) = bl.value
        val x = java.util.Arrays.binarySearch(bids, ia)
        val y = java.util.Arrays.binarySearch(bids, ib)
        if (x < 0 || y < 0) 0.0
        else {
          val a = bshs(x); val b = bshs(y)
          if (a.isEmpty && b.isEmpty) 0.0
          else {
            var i = 0; var j = 0; var inter = 0
            while (i < a.length && j < b.length) {
              val u = a(i); val v = b(j)
              if (u == v) { inter += 1; i += 1; j += 1 }
              else if (u < v) i += 1
              else j += 1
            }
            val union = a.length + b.length - inter
            if (union == 0) 0.0 else inter.toDouble / union
          }
        }
      }
      val nH = timed("hashedExact verified |H| (probe)")(
        candidates.filter(jac(col("id_a"), col("id_b")) >= tau).count())
      println(s"[recall-stage] hashedExact tau=$tau candidates=$nCand H=$nH")
      candidates.unpersist()
    }
    val (lr99, lb99) = Dedup.lshAutoShape(0.4, 0.99, 64)
    val eqCount = udf { (a: Seq[Long], bb: Seq[Long]) =>
      var i = 0; var eq = 0
      val n = math.min(a.length, bb.length)
      while (i < n) { if (a(i) == bb(i)) eq += 1; i += 1 }
      eq
    }
    for ((label, nh, b, cap) <- Seq(
        ("legacy_16x4", 16, 4, 100),
        ("tuned", 64, 32, 1000),
        (s"p99_r${lr99}x$lb99", lr99 * lb99, lb99, 7608))) {
      val r = nh / b
      val sigs = perDoc.select(col("__id"), slice(col("sig"), 1, nh).as("sig"))
      val banded0 = sigs.select(col("__id"),
        posexplode(array((0 until b).map { bb =>
          xxhash64(slice(col("sig"), bb * r + 1, r)
            .cast("array<string>").cast("string"))
        }: _*)).as(Seq("band", "band_hash")))
      val ok = banded0.groupBy(col("band"), col("band_hash"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") <= cap)
        .drop("__n")
      val kept = banded0.join(ok, Seq("band", "band_hash"), "left_semi")
      val candRaw = kept.select(col("band"), col("band_hash"), col("__id").as("id_a"))
        .join(kept.select(col("band"), col("band_hash"), col("__id").as("id_b")),
          Seq("band", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val nRaw = timed(s"$label candRaw count")(candRaw.count())
      val cutoff = math.max(0.0, 0.4 - 0.25)
      val sigOnly = broadcast(sigs)
      val est = candRaw
        .join(sigOnly.select(col("__id").as("id_a"), col("sig").as("sa")), Seq("id_a"))
        .join(sigOnly.select(col("__id").as("id_b"), col("sig").as("sb")), Seq("id_b"))
        .filter(eqCount(col("sa"), col("sb")) >= math.ceil(cutoff * nh).toInt)
        .select("id_a", "id_b")
      val dedup = est.dropDuplicates("id_a", "id_b").persist()
      val nSurv = timed(s"$label est survivors (dedup)")(dedup.count())
      val shOnly = broadcast(perDoc.select(col("__id"), col("sh")))
      val ver = dedup
        .join(shOnly.select(col("__id").as("id_a"), col("sh").as("sha")), Seq("id_a"))
        .join(shOnly.select(col("__id").as("id_b"), col("sh").as("shb")), Seq("id_b"))
        .filter(Dedup.jaccardOfSortedLongs(col("sha"), col("shb")) >= 0.4)
      val nVer = timed(s"$label verified count")(ver.count())
      println(s"[recall-stage] $label nh=$nh b=$b cap=$cap " +
        s"candRaw=$nRaw survivors=$nSurv verified=$nVer")
      dedup.unpersist()
    }
    spark.stop()
  }
}
