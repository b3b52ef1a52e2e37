package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tick→bar and bar roll-up aggregation (SURVEY §2.5 A3/A4).
  *
  * The reference computes 1-minute OHLCV from ticks with a GROUP BY plus
  * a *self-join* back to the extremes for open/close
  * (/root/reference/tasks/pytdx/stock_tick_2_bar.py:39-55). Spark's
  * `min_by`/`max_by` make that one pass — a single partial-aggregatable
  * groupBy, no join, which is the shape that survives 100 TB of ticks.
  */
object Resample {

  /** Tick→fixed-window OHLCV bars. `seqCol` orders ticks within a window
    * (the reference's tick `index`); open/close = price at min/max seq.
    */
  def ticksToBars(
      ticks: DataFrame, keys: Seq[String], tsCol: String, seqCol: String,
      priceCol: String, volCol: String, windowDuration: String): DataFrame =
    ticks
      .groupBy(keys.map(col) :+ window(col(tsCol), windowDuration).as("w"): _*)
      .agg(
        min_by(col(priceCol), col(seqCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(seqCol)).as("close"),
        sum(col(volCol)).as("volume"),
        sum(col(priceCol) * col(volCol)).as("amount"),
        count(lit(1)).as("n_ticks"))
      .select(keys.map(col) ++ Seq(col("w.start").as("bar_start"), col("open"),
        col("high"), col("low"), col("close"), col("volume"), col("amount"),
        col("n_ticks")): _*)

  /** Fine bars → N-minute bars: first open, max high, min low, last close,
    * summed volume (/root/reference/tasks/wind/handle_csv/merge_2_n_bar.py:39-52
    * — implementing the *intended* semantics; the reference's `low` is a
    * scalar-min bug, see SURVEY §7.4).
    */
  def rollUpBars(
      bars: DataFrame, keys: Seq[String], tsCol: String, minutes: Int): DataFrame =
    bars
      .groupBy(keys.map(col) :+ window(col(tsCol), s"$minutes minutes").as("w"): _*)
      .agg(
        min_by(col("open"), col(tsCol)).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col(tsCol)).as("close"),
        sum(col("volume")).as("volume"))
      .select(keys.map(col) ++ Seq(col("w.start").as("bar_start"), col("open"),
        col("high"), col("low"), col("close"), col("volume")): _*)

  /** D8 — big-order cash-flow stats: conditional sums over a buy/sell
    * flag and a notional threshold
    * (/root/reference/tasks/pytdx/cash_flow_daily.py:11-35).
    * `buyFlag` marks buys; notional = price×vol.
    */
  def bigOrderFlow(
      ticks: DataFrame, keys: Seq[String], priceCol: String, volCol: String,
      buyFlag: Column, threshold: Double): DataFrame = {
    val notional = col(priceCol) * col(volCol)
    val isBig = notional >= lit(threshold)
    ticks.groupBy(keys.map(col): _*).agg(
      sum(when(buyFlag && isBig, notional).otherwise(0.0)).as("big_buy_amount"),
      sum(when(!buyFlag && isBig, notional).otherwise(0.0)).as("big_sell_amount"),
      sum(when(buyFlag && isBig, col(volCol)).otherwise(0.0)).as("big_buy_vol"),
      sum(when(!buyFlag && isBig, col(volCol)).otherwise(0.0)).as("big_sell_vol"),
      sum(notional).as("total_amount"))
      .withColumn("net_big_buy_amount", col("big_buy_amount") - col("big_sell_amount"))
      .withColumn("big_ratio",
        when(col("total_amount") =!= 0,
          (col("big_buy_amount") + col("big_sell_amount")) / col("total_amount")))
  }

  /** Volume-weighted average price per calendar bucket × key — the
    * bar statistic the reference's tick resamplers stop short of (its
    * minute bars keep open/high/low/close/vol,
    * /root/reference/tasks/pytdx/md_min.py, but the cash-flow report
    * divides Σ(price·vol) notionals the same way,
    * /root/reference/tasks/pytdx/cash_flow_daily.py:14).
    *
    * Exactness: price and volume are cast to DECIMAL(18,2) so the
    * Σ(p·v) and Σv partial sums are exact at any partitioning; the
    * single vwap division happens AFTER both sums are cast to double —
    * deterministic IEEE on identical operands, so the oracle replays it
    * exactly. One partial-aggregated shuffle on (bucket, keys).
    */
  def vwapBars(ticks: DataFrame, bucket: Column, keys: Seq[Column],
      priceCol: Column, volCol: Column): DataFrame = {
    val dec = "decimal(18,2)"
    val p = priceCol.cast(dec)
    val v = volCol.cast(dec)
    ticks.groupBy((bucket.as("bucket") +: keys): _*)
      .agg(
        sum(v).cast("double").as("volume"),
        sum(p * v).cast("double").as("amount"),
        count(lit(1)).as("n_ticks"))
      .withColumn("vwap", col("amount") / nullif(col("volume"), lit(0.0)))
  }

  /** Per-key EWMA — the classic infinite-memory indicator no window
    * frame expresses (every output depends on ALL prior rows):
    * `e_1 = x_1`, `e_t = α·x_t + (1−α)·e_{t−1}` in (orderCol, tieCol)
    * order.
    *
    * Shape: ONE shuffle on the key, then a sequential in-order fold per
    * group (the d1/adj-factor typed-kernel pattern — per-key series fit
    * a task; the fold is O(n) with O(1) state). Doubles fold in row
    * order with the α constants fixed, so the series is deterministic
    * at any partitioning and replayable by the oracle's recursive CTE.
    * Event time is compared in exact integer micros (a timestamp→double
    * cast would lose sub-second order at 2^53).
    *
    * Returns `(key, tie, value, ewma)` with the raw (unrounded) fold
    * value — presentation rounding is the caller's choice.
    */
  def ewma(events: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0, 1]")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("__k"),
        unix_micros(col(orderCol)).as("__o"),
        col(tieCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__x"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var prev = 0.0
        var first = true
        rows.iterator.map { r =>
          val e = if (first) { first = false; r._4 }
          else alpha * r._4 + (1 - alpha) * prev
          prev = e
          (k, r._3, r._4, e)
        }
      }
      .toDF(keyCol, tieCol, valueCol, "ewma")
  }
}
