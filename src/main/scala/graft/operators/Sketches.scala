package graft.operators

import graft.functions.Md5Hash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-memory, shard-mergeable sketches beyond the CMS/HLL pair in
  * [[CorpusStats]]: a Bloom filter for set membership and an equi-width
  * histogram for quantiles. Both follow the house sketch contract:
  *
  *  - built by ONE partial-aggregated pass (the partial aggregation IS
  *    the shard merge — Bloom words OR together, histogram bins add);
  *  - memory independent of data size (m/63 longs; nBins counters) —
  *    at 100 TB the sketch is the only thing that ever leaves the
  *    executors;
  *  - every hash/bin is deterministic Column algebra over MD5 windows
  *    ([[graft.functions.Md5Hash]] layout) or plain IEEE arithmetic, so
  *    the DuckDB correctness oracle rebuilds the identical structure.
  *
  * The reference keeps exact key tables for its largest membership
  * checks (`obj_2_db` PK dedup, `tasks/utils/to_sqlite.py:402-405`) —
  * viable at MySQL scale, not at corpus scale; these sketches are the
  * constant-memory counterpart used by the curation pipeline.
  */
object Sketches {

  /** The Kirsch–Mitzenmacher double-hash positions g_i = (h1 + i·h2)
    * mod mBits, i < k — h1/h2 are the shared MD5 windows, so both the
    * Scala probe kernel and the SQL oracle derive identical positions.
    */
  private def bloomPositions(v: Column, k: Int, mBits: Long): Column = {
    val m5 = md5(v.cast("string"))
    val h1 = conv(substring(m5, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(m5, 16, 14), 16, 10).cast("long")
    transform(sequence(lit(0), lit(k - 1)),
      i => pmod(h1 + i * h2, lit(mBits)))
  }

  /** Build a Bloom filter over `valueCol`: sparse `(word, bits)` rows,
    * bit positions packed 63 per long (bit 63 stays clear — DuckDB's
    * checked `<<` rejects a sign-bit shift, and an always-positive word
    * round-trips every engine). Explode k positions → one partial-
    * aggregated `bit_or` per word; shards merge by the same OR. Absent
    * words are all-zero and implicit, so sparsity is free until the
    * filter fills.
    */
  def bloomBuild(df: DataFrame, valueCol: Column,
      mBits: Long = 1L << 20, k: Int = 5): DataFrame = {
    require(mBits > 0, s"mBits=$mBits must be positive")
    require(k >= 1 && k <= 16, s"k=$k out of the overflow-safe range 1..16")
    df.select(explode(bloomPositions(valueCol, k, mBits)).as("pos"))
      .select(expr("pos div 63").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("__b"))
      .groupBy(col("word"))
      .agg(expr("bit_or(__b)").as("bits"))
  }

  /** Probe a built filter: adds `might_contain` to `probes` — false is
    * certain absence, true is presence up to the standard false-positive
    * rate. The filter densifies to an `Array[Long]` on the driver
    * (m/63 longs — model-sized, the k-means-centroid precedent) and
    * ships as a BROADCAST referenced by a native codegen'd expression
    * ([[graft.plans.BloomProbeExpr]]): tasks serialize the broadcast id,
    * executors fetch the words once, and the probe stays inside
    * whole-stage codegen — zero shuffles and O(k) per row, because
    * membership at 100 TB must not cost a join against the key set —
    * that join is exactly what the sketch exists to delete. The kernel
    * hashes with [[Md5Hash.h1h2]], the same windows [[bloomBuild]]'s
    * Column algebra uses, so probe and build can never disagree on a
    * position.
    */
  def bloomMightContain(sketch: DataFrame, probes: DataFrame,
      valueCol: Column, mBits: Long = 1L << 20, k: Int = 5): DataFrame = {
    // 2^30 bits → ~17M longs ≈ 136 MB densified: the ceiling for a
    // driver-held, broadcast-shipped model (beyond it, ship the sparse
    // sketch and broadcast-join instead).
    require(mBits > 0 && mBits <= (1L << 30), s"mBits=$mBits out of range")
    require(k >= 1 && k <= 16, s"k=$k out of the overflow-safe range 1..16")
    val nWords = ((mBits + 62) / 63).toInt
    val words = new Array[Long](nWords)
    sketch.select(col("word").cast("long"), col("bits").cast("long"))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val bc = probes.sparkSession.sparkContext.broadcast(words)
    val probe = org.apache.spark.sql.classic.GraftPlanBridge.column(
      graft.plans.BloomProbeExpr(
        org.apache.spark.sql.classic.GraftPlanBridge.expression(valueCol.cast("string")),
        bc, mBits, k))
    probes.withColumn("might_contain", probe)
  }

  /** Equi-width histogram of `valueCol` over [lo, hi): `(bin, cnt)`
    * rows, out-of-range values clamped into the edge bins so the
    * histogram always accounts for every non-null row (quantiles stay
    * well-defined under outliers). One map-only projection + one
    * partial-aggregated count; bins of shards add. The bin boundary
    * arithmetic is a fixed IEEE expression — floor((x−lo)/w) with
    * w = (hi−lo)/nBins — that any engine evaluates identically.
    */
  def histogram(df: DataFrame, valueCol: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad histogram range [$lo,$hi)/$nBins")
    val w = (hi - lo) / nBins
    df.select(valueCol.cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .select(least(greatest(floor((col("__x") - lo) / w), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("int").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[histogram]]: for each q, target rank
    * q·N over the cumulative bin counts, linear interpolation inside
    * the landing bin: est = lo + w·(bin + (target − cum_prev)/cnt).
    * All inputs to the double arithmetic are exact integers, so the
    * estimate is one fixed IEEE expression per q. The cumulative window
    * runs single-partition over ≤ nBins rows — sketch-sized by
    * construction, like the CMS grid, never data-sized. Returns
    * `(q, est)` per requested quantile.
    */
  /** Per-group [[histogram]]: `(grp, bin, cnt)` — one partial-aggregated
    * count keyed by (group, bin), so a billion-group histogram is one
    * shuffle of sketch-sized rows, and group shards merge by addition
    * exactly like the global sketch.
    */
  def histogramBy(df: DataFrame, groupCol: Column, valueCol: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad histogram range [$lo,$hi)/$nBins")
    val w = (hi - lo) / nBins
    df.select(groupCol.as("grp"), valueCol.cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .select(col("grp"),
        least(greatest(floor((col("__x") - lo) / w), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("int").as("bin"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group [[histQuantiles]]: interpolated quantile estimates from a
    * [[histogramBy]] result — `(grp, q, est)`. The cumulative window and
    * rank run per group over ≤ nBins rows each; group count is unbounded
    * but every row is sketch-sized.
    */
  def histQuantilesBy(hist: DataFrame, qs: Seq[Double],
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs $qs")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = (hi - lo) / nBins
    val cumW = Window.partitionBy(col("grp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("prev", col("cum") - col("cnt"))
    val totals = cum.groupBy(col("grp")).agg(max(col("cum")).as("__n"))
    val qdf = qs.toDF("q")
    val hit = Window.partitionBy(col("grp"), col("q")).orderBy(col("bin"))
    cum.join(totals, Seq("grp"))
      .crossJoin(broadcast(qdf))
      .withColumn("target", col("q") * col("__n"))
      .filter(col("cum") >= col("target"))
      .withColumn("__rn", row_number().over(hit))
      .filter(col("__rn") === 1)
      .select(col("grp"), col("q"),
        (lit(lo) + lit(w) * (col("bin") +
          (col("target") - col("prev")) / col("cnt"))).as("est"))
  }

  def histQuantiles(hist: DataFrame, qs: Seq[Double],
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs $qs")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = (hi - lo) / nBins
    val cumW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("prev", col("cum") - col("cnt"))
    val total = cum.agg(max(col("cum")).as("__n"))
    val qdf = qs.toDF("q")
    val hit = Window.partitionBy(col("q")).orderBy(col("bin"))
    qdf.crossJoin(broadcast(total))
      .withColumn("target", col("q") * col("__n"))
      .join(cum, col("cum") >= col("target"))
      .withColumn("__rn", row_number().over(hit))
      .filter(col("__rn") === 1)
      .select(col("q"),
        (lit(lo) + lit(w) * (col("bin") +
          (col("target") - col("prev")) / col("cnt"))).as("est"))
  }
}
