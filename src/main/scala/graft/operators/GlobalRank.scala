package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global ordering WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key moves the whole dataset
  * into ONE task (Spark even warns) — the textbook 100 TB anti-pattern
  * hiding inside global ntile/row_number. The scalable exact shape is
  * the two-pass rank: range-partition on the order key, sort within
  * partitions, number rows locally, then add per-partition offsets
  * (a partition-count-sized driver table). The range bounds come from
  * sampling, so WHERE a row lands is not reproducible — but its global
  * rank is: offsets absorb whatever the bounds were, and a UNIQUE order
  * key makes the total order (and every rank) exact and deterministic.
  *
  * The staged sort is materialized to scratch once so the offset table
  * and every downstream consumer read the SAME partitioning (range
  * bounds are re-sampled per job otherwise, which would mismatch the
  * offsets).
  */
object GlobalRank {

  /** `df` plus `rankCol` = exact 1-based global rank under `order`
    * (which must be a UNIQUE total order — ties would get arbitrary but
    * distinct ranks). One range shuffle, no single-partition stage.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // monotonically_increasing_id = (partitionId << 33) | localSequence,
    // assigned in processing order — which IS the sorted order because
    // the projection sits on top of the in-partition sort in one stage
    val staged = graft.core.Scratch.materialize(
      df.repartitionByRange(n, order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__mid", monotonically_increasing_id()),
      "globalrank", s"$rankCol|${order.map(_.toString).mkString(",")}|${graft.core.Scratch.planKey(df)}")
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__loc", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
    val counts = staged.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Long, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    staged
      .withColumn(rankCol,
        element_at(typedlit(offsets), col("__pid")) + col("__loc") + 1)
      .drop("__mid", "__pid", "__loc")
  }

  /** `df` plus `sumCol` = exact INCLUSIVE running sum of `valueCol`
    * (long) under the global `order` — the two-pass shape of
    * [[withGlobalRank]] with per-partition token sums instead of counts:
    * range-partition on the order key, local running sums inside each
    * (normal-sized) shuffle partition, plus a driver prefix over the
    * partition-count-sized per-partition totals. No single-partition
    * window anywhere, so the order key's distribution — including the
    * fully degenerate one-value case — cannot recreate a global sort
    * on one task. `order` should be a unique total order for a
    * deterministic result (same contract as [[withGlobalRank]]).
    *
    * Null `valueCol` values count as 0 — both in the per-partition
    * totals (sum skips nulls; an all-null partition's total is
    * coalesced to 0) and in the window branch (`sum` over a running
    * frame likewise skips nulls), so the two passes agree.
    */
  def withRunningSum(df: DataFrame, order: Seq[Column], valueCol: String,
      sumCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val staged = graft.core.Scratch.materialize(
      df.repartitionByRange(n, order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__mid", monotonically_increasing_id()),
      "runsum", s"$sumCol|$valueCol|${order.map(_.toString).mkString(",")}|${graft.core.Scratch.planKey(df)}")
      .withColumn("__pid", shiftright(col("__mid"), 33))
    val totals = staged.groupBy(col("__pid"))
      .agg(coalesce(sum(col(valueCol)), lit(0L)).as("__s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Long, Long] =
      totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__mid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    staged
      .withColumn(sumCol,
        element_at(typedlit(offsets), col("__pid")) +
          coalesce(sum(col(valueCol)).over(w), lit(0L)))
      .drop("__mid", "__pid")
  }

  /** `df` plus `bucketCol` = EXACT `ntile(buckets)` semantics over the
    * global `order` (first `n % buckets` buckets get the extra row),
    * built on [[withGlobalRank]] — bit-identical to
    * `ntile(buckets).over(Window.orderBy(order))` with none of its
    * single-partition execution.
    */
  def withNtile(df: DataFrame, order: Seq[Column], buckets: Int,
      bucketCol: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val ranked = withGlobalRank(df, order, "__r")
    val total = ranked.agg(count(lit(1))).head().getLong(0)
    val q = total / buckets
    val rem = total % buckets
    val cut = (q + 1) * rem // ranks ≤ cut sit in the (q+1)-sized buckets
    val r = col("__r")
    val bucket =
      if (q == 0) r // more buckets than rows: rank IS the bucket
      else when(r <= cut, (r - 1) / (q + 1) + 1)
        .otherwise(lit(rem) + (r - cut - 1) / q + 1)
    ranked.withColumn(bucketCol, bucket.cast("long")).drop("__r")
  }
}
