package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-budget corpus cut: keep the highest-quality documents until a
  * token budget is exhausted — the curation step that turns "score every
  * doc" into "the training set is the best N tokens" (the FineWeb/DCLM
  * pipeline shape). LLM-operator family (SURVEY §2.14), not a reference
  * capability.
  *
  * The naive form — global sort by score + running token sum — is a
  * full-corpus range exchange plus a single-partition window: the
  * classic 100 TB scale-killer. This is the two-pass histogram form
  * instead:
  *
  *   1. one partial-agg shuffle builds per-score-bucket token totals
  *      (≤ `buckets`+1 rows — model-sized, collected to the driver like
  *      centroid/seed tables elsewhere in this repo);
  *   2. a driver prefix-scan over the descending buckets finds the
  *      boundary bucket and its residual budget;
  *   3. full buckets pass wholesale as a map-only filter (`__b >
  *      boundary` — fused into the scan); ONLY the boundary bucket —
  *      corpus/buckets of the data, not the corpus — pays a sorted
  *      window for the exact cutoff.
  *
  * Keep rule inside the boundary bucket: (score desc, id asc) order,
  * keep while the inclusive running token sum fits the residual budget —
  * deterministic, and exact integer arithmetic end to end.
  *
  * Contract — ENFORCED, not assumed: `scoreCol` in [0,1] (clamped);
  * one bucket should fit a task's window comfortably (with the default
  * 1000 buckets that is 0.1% of the corpus). A degenerate score
  * distribution (a saturated classifier scoring every doc the same
  * constant) would put the WHOLE corpus in the boundary bucket and
  * recreate exactly the single-partition global sort this operator
  * exists to avoid — so pass 1's driver histogram, which already knows
  * every bucket's token mass, routes a boundary bucket heavier than
  * `maxBoundaryShare` of the corpus through
  * [[GlobalRank.withRunningSum]]: the same exact inclusive running sum,
  * computed as a range shuffle + per-partition windows + a driver
  * prefix over partition totals. Same keep set either way; the switch
  * only changes the physical plan.
  */
object BudgetCut {

  /** Returns `docs`' (idCol, scoreCol, tokensCol) rows that survive the
    * cut (tokensCol cast to long). Rows with a NULL score or NULL token
    * count are EXCLUDED before bucketing — an unscored document has no
    * defensible position in a quality ordering, and a null bucket would
    * otherwise poison the driver histogram. */
  def qualityBudgetCut(docs: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, budgetTokens: Long, buckets: Int = 1000,
      maxBoundaryShare: Double = 0.05): DataFrame = {
    val withB = docs
      .filter(col(scoreCol).isNotNull && col(tokensCol).isNotNull)
      .select(col(idCol), col(scoreCol), col(tokensCol).cast("long").as(tokensCol))
      .withColumn("__b",
        floor(least(greatest(col(scoreCol), lit(0.0)), lit(1.0)) * buckets).cast("int"))
    // Pass 1: bounded histogram (bucket → token mass), driver-side
    // prefix scan descending. rows ≤ buckets+1 — model-sized by contract.
    val hist = withB.groupBy("__b").agg(sum(tokensCol).as("__t")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    var rem = budgetTokens
    var minFull = Int.MaxValue // smallest fully-kept bucket; MaxValue = none fit
    var boundary = Int.MinValue // bucket that only partially fits, if any
    var boundaryBudget = 0L
    var done = false
    val it = hist.iterator
    while (!done && it.hasNext) {
      val (bk, t) = it.next()
      // `t <= rem` FIRST: a zero-mass bucket (docs with 0 tokens) always
      // fits, even at exact budget exhaustion (rem == 0) — the full-
      // bucket keep rule is `prefix + t <= budget`, and checking
      // exhaustion first would exclude a free bucket sitting on the seam.
      if (t <= rem) { minFull = bk; rem -= t }
      else if (rem <= 0) done = true
      else { boundary = bk; boundaryBudget = rem; done = true }
    }
    // Every present bucket ≥ minFull was visited descending and fit
    // wholesale (empty-budget edge: minFull stays MaxValue → keeps none;
    // budget ≥ total: minFull = smallest present bucket → keeps all).
    val fullPart = withB.filter(col("__b") >= lit(minFull))
    val kept =
      if (boundary == Int.MinValue) fullPart
      else {
        // Pass 2 (boundary bucket only): exact cutoff by inclusive
        // running token sum in (score desc, id) order. Physical plan is
        // chosen from pass 1's histogram: a boundary bucket inside the
        // share contract pays one tiny single-bucket window; a heavier
        // one (degenerate score distribution) pays the distributed
        // two-pass running sum instead — never a corpus-sized
        // single-partition sort.
        val totalMass = hist.iterator.map(_._2).sum
        val boundaryMass = hist.collectFirst { case (b, t) if b == boundary => t }.getOrElse(0L)
        val boundPart = withB.filter(col("__b") === lit(boundary))
        val withRun =
          if (totalMass > 0 && boundaryMass.toDouble / totalMass > maxBoundaryShare)
            GlobalRank.withRunningSum(boundPart,
              Seq(col(scoreCol).desc, col(idCol)), tokensCol, "__run")
          else {
            val w = Window.partitionBy("__b")
              .orderBy(col(scoreCol).desc, col(idCol))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            boundPart.withColumn("__run", sum(tokensCol).over(w))
          }
        val cutPart = withRun.filter(col("__run") <= boundaryBudget)
          .select(fullPart.columns.map(col).toIndexedSeq: _*)
        fullPart.unionAll(cutPart)
      }
    kept.drop("__b")
  }
}
