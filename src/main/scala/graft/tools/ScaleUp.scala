package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build a larger scale factor from the driver-generated testdata by
  * key-shifted replication: each of `copies` copies shifts every
  * primary/foreign key by a copy-sized constant (consistently across
  * fact↔dim so joins keep their selectivity), leaving dates, prices,
  * and text payloads as-is. `region`/`nation` stay fixed, exactly like
  * TPC-H dims. The result is a distribution-preserving 10× corpus for
  * SCALING measurements (sf0.1 → "sf1" runtime ratios in BASELINE.md)
  * — not a substitute for the real generator: replicated document text
  * means near-dup pair queries see 10 near-identical copies per doc,
  * so their OUTPUT grows quadratically in the copy count by design.
  *
  * `mutated` mode (4th arg) perturbs the replicated DOCUMENT TEXT and
  * (r15) the replicated EMBEDDING VECTORS so the true near-dup pair set
  * grows realistically (≈ linearly in copies) instead of quadratically:
  * copy 0 stays verbatim; ~20% of the other copies are LIGHT variants
  * (2% of tokens replaced / ±2%·RMS vector noise — a re-crawl with a
  * tweaked footer, still a true near-dup at τ=0.4 / eps=0.9) and the
  * remaining ~80% are HEAVY rewrites (40% of tokens replaced / ±10·RMS
  * noise — similarity collapses well below any dedup threshold, i.e. a
  * genuinely new document that happens to share phrasing). All
  * replacement is a pure deterministic function of (id, copy, position):
  * no RNG state, so two builds of the same corpus are byte-identical.
  * Bench-only — the correctness oracles always run on driver testdata.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir dstDir copies [mutated]]
  */
object ScaleUp {

  /** splitmix64 — deterministic position hash for mutation decisions. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private[tools] def mutateText(text: String, docId: Long, copy: Int): String = {
    if (copy == 0 || text == null) text
    else {
      val light = java.lang.Math.floorMod(mix(docId * 31L + copy), 5L) == 0L
      val rate = if (light) 2L else 40L
      text.split(" ", -1).zipWithIndex.map { case (t, p) =>
        if (java.lang.Math.floorMod(
            mix((docId << 20) ^ (copy.toLong << 40) ^ p.toLong), 100L) < rate)
          s"m${copy}q$p" else t
      }.mkString(" ")
    }
  }

  /** The vector twin of [[mutateText]] (r15 — closes the embedding-side
    * realistic-growth gap: dd_embed_cosine / dd_doc_semdedup / v_* decade
    * ratios were verbatim-corpus artifacts before this): copy 0 stays
    * byte-identical; ~20% of other copies are LIGHT variants (±2%·RMS
    * additive noise per component — cosine ≈ 0.9999, still inside any
    * near-dup eps), the remaining ~80% HEAVY rewrites (±10·RMS noise —
    * uniform noise carries RMS amplitude/√3 ≈ 5.8·RMS, so cosine to the
    * original lands at ≈ 0.17 ± 1/√dim: statistically a FRESH vector,
    * always far below the semantic eps = 0.9 and only brushing the 0.3
    * fixture band exactly as often as genuinely new random vectors do).
    * Noise is a pure function of
    * (vecId, copy, position): no RNG state, byte-identical across builds.
    * Matches the text mutator's 20/80 split decision hash so a document
    * and its embedding agree on light-vs-heavy.
    */
  private[tools] def mutateVec(vec: Seq[Float], vecId: Long, copy: Int): Seq[Float] = {
    if (copy == 0 || vec == null) vec
    else {
      val light = java.lang.Math.floorMod(mix(vecId * 31L + copy), 5L) == 0L
      val scale = if (light) 0.02 else 10.0
      var ss = 0.0
      vec.foreach(x => ss += x.toDouble * x.toDouble)
      val rms = math.sqrt(ss / math.max(vec.length, 1))
      vec.zipWithIndex.map { case (x, i) =>
        val u = java.lang.Math.floorMod(
          mix((vecId << 20) ^ (copy.toLong << 40) ^ i.toLong), 2001L) - 1000L
        (x.toDouble + scale * rms * (u.toDouble / 1000.0)).toFloat
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val mutated = args.lift(3).contains("mutated")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val shifts: Map[String, Map[String, Long]] = Map(
      "customer" -> Map("c_custkey" -> 1000000L),
      "supplier" -> Map("s_suppkey" -> 1000000L),
      "part" -> Map("p_partkey" -> 1000000L),
      "orders" -> Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L),
      "lineitem" -> Map("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
        "l_suppkey" -> 1000000L),
      "events" -> Map("event_id" -> 10000000L, "user_id" -> 1000000L),
      "documents" -> Map("doc_id" -> 1000000L),
      "embeddings" -> Map("vec_id" -> 1000000L))

    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t copied as-is")
    }
    val mutateUdf = udf(mutateText _)
    val mutateVecUdf = udf(mutateVec _)
    for ((t, shift) <- shifts) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val scaled = (0 until copies).map { i =>
        val shifted = base.select(base.schema.fields.map { f =>
          shift.get(f.name) match {
            case Some(s) => (col(f.name) + lit(s * i)).cast(f.dataType).as(f.name)
            case None => col(f.name)
          }
        }: _*)
        if (mutated && t == "documents")
          shifted.withColumn("text",
            mutateUdf(col("text"), col("doc_id") - lit(1000000L * i), lit(i)))
        else if (mutated && t == "embeddings")
          shifted.withColumn("embedding",
            mutateVecUdf(col("embedding"), col("vec_id") - lit(1000000L * i), lit(i))
              .cast("array<float>"))
        else shifted
      }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$copies -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
