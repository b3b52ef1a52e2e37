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
}
