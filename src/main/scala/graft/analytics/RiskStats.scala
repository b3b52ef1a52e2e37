package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Return-series risk analytics — the downstream consumers the
  * reference's data model exists to feed. The reference builds
  * adjusted-price and continuous-contract series
  * (/root/reference/tasks/wind/future_reorg/reversion_rights_factor.py,
  * /root/reference/tasks/tushare/tushare_future/continuse_contract_md.py)
  * and ships NAV windows into pandas `describe()` reports
  * (/root/reference/tasks/report/fund/worst_fund.py:23-57); the natural
  * next queries over those series — drawdown, beta, rank IC, VWAP —
  * are implemented here as pure window/agg plans.
  *
  * Numeric contract (house style): every reduction that feeds a
  * comparison or a division is either an exact DECIMAL sum, an exact
  * integer-unit sum (micro-scaled longs), or a deterministic
  * per-row IEEE op on identical inputs — so the DuckDB oracle replays
  * each result bit-for-bit without tolerance knobs.
  *
  * Scale notes: everything is one window or one partial-aggregated
  * shuffle keyed by the series key (or the calendar bucket); no
  * driver-side state, no cross-key data movement beyond the keyed
  * shuffle, so the plans hold at 1000-executor scale unchanged.
  */
object RiskStats {

  /** Max drawdown per series: running peak → per-row drawdown
    * `price/peak - 1` → deepest trough per key, with a fully
    * deterministic trough pick (worst drawdown, earliest time, lowest
    * tie-break). Two windows over ONE keyed sort — Catalyst reuses the
    * exchange+sort between the running-max and the rank window.
    *
    * Output: key, n_obs, max_drawdown (≤ 0), trough columns.
    */
  def maxDrawdown(df: DataFrame, key: Column, ts: Column, tie: Column,
      price: Column): DataFrame = {
    val run = Window.partitionBy(key).orderBy(ts, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = df
      .withColumn("__peak", max(price).over(run))
      .withColumn("drawdown", price / col("__peak") - lit(1.0))
    val pick = Window.partitionBy(key).orderBy(col("drawdown").asc, ts.asc, tie.asc)
    dd.withColumn("__rn", row_number().over(pick))
      .withColumn("n_obs", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__rn") === 1)
      .select(key.as("series_key"), col("n_obs"),
        col("drawdown").as("max_drawdown"), to_date(ts).as("trough_date"))
  }

  /** Clamp a raw simple return into a plausible band before micro-unit
    * scaling — winsorizes data errors (the reference's vendor feeds mix
    * unit conventions; see its `utils/check.py` price sanity bands) and
    * bounds the integer magnitude so 8-row co-moment sums stay inside
    * Long exactly.
    */
  private def clampRet(r: Column): Column =
    least(greatest(r, lit(-0.99)), lit(9.99))

  /** Simple return series per key: `price / lag(price) - 1` in event
    * order. Null first row dropped.
    */
  def simpleReturns(df: DataFrame, key: Column, ts: Column, tie: Column,
      price: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    df.withColumn("ret", price / lag(price, 1).over(w) - lit(1.0))
      .filter(col("ret").isNotNull)
  }

  /** Rolling OLS beta of an asset return vs a market return over a
    * trailing `n`-row window per key:
    * `beta = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` with x = market,
    * y = asset. Returns are clamped and scaled to exact micro-unit
    * longs first, so every windowed sum is integer-exact and
    * partition-order independent; only the final division is floating
    * point (deterministic: both operands are exact integers ≤ 2^63).
    *
    * `assetMicro`/`mktMicro` must already be micro-unit longs (use
    * [[toMicro]]). Rows before the window fills (`row_number < n`)
    * are dropped — a partial-window beta is statistically meaningless.
    */
  def rollingBeta(df: DataFrame, key: Column, ts: Column, tie: Column,
      assetMicro: Column, mktMicro: Column, n: Int): DataFrame = {
    // Exact-sum bound: with |micro| ≤ 9.99e6 (the clamp), the largest
    // intermediate is n·Σxy ≤ n²·(9.99e6)², which must stay under
    // Long.Max ≈ 9.22e18 → n ≤ √(9.22e18 / 9.98e13) ≈ 303. Spark's
    // non-ANSI Long arithmetic would wrap SILENTLY past that while
    // DuckDB promotes to HUGEINT, so the ceiling is enforced, not
    // documented away.
    require(n >= 2 && n <= 303, s"window n=$n exceeds the Long-exact co-moment bound (303)")
    val order = Window.partitionBy(key).orderBy(ts, tie)
    val w = order.rowsBetween(-(n - 1), 0)
    val nn = lit(n.toLong)
    val sx = sum(mktMicro).over(w)
    val sy = sum(assetMicro).over(w)
    val sxy = sum(mktMicro * assetMicro).over(w)
    val sxx = sum(mktMicro * mktMicro).over(w)
    df.withColumn("__rn", row_number().over(order))
      .withColumn("__num", (nn * sxy - sx * sy).cast("double"))
      .withColumn("__den", (nn * sxx - sx * sx).cast("double"))
      .filter(col("__rn") >= n)
      .withColumn("beta", col("__num") / nullif(col("__den"), lit(0.0)))
  }

  /** Exact micro-unit scaling of a clamped return: `round(r·1e6)` as a
    * long via Spark's shortest-decimal-representation HALF_UP round —
    * the oracle replays it with the VARCHAR→DECIMAL jr() cast.
    */
  def toMicro(r: Column): Column =
    round(clampRet(r) * lit(1000000.0), 0).cast("long")

  /** Cross-sectional Spearman rank information coefficient per bucket:
    * rank the universe by `factor` and by `outcome` inside each bucket
    * (row_number with an id tie-break → distinct integer ranks, no tie
    * correction needed), then the classic
    * `IC = 1 − 6·Σd² / (n·(n²−1))` — Σd² is an exact long sum, the
    * single division is deterministic IEEE. Buckets with n < minN are
    * dropped (IC undefined below 3).
    */
  def spearmanIC(df: DataFrame, bucket: Column, id: Column,
      factor: Column, outcome: Column, minN: Int = 3): DataFrame = {
    val rx = row_number().over(Window.partitionBy(bucket).orderBy(factor.asc, id.asc))
    val ry = row_number().over(Window.partitionBy(bucket).orderBy(outcome.asc, id.asc))
    df.select(bucket.as("bucket"), rx.cast("long").as("__rx"), ry.cast("long").as("__ry"))
      .withColumn("__d", col("__rx") - col("__ry"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__d") * col("__d")).as("__sd2"))
      .filter(col("n") >= minN)
      .withColumn("ic",
        lit(1.0) - (lit(6.0) * col("__sd2").cast("double")) /
          (col("n") * (col("n") * col("n") - lit(1L))).cast("double"))
      .drop("__sd2")
  }

  /** Pairwise Pearson correlation matrix over keyed return series
    * aligned on a bucket column — the portfolio/risk consumer next to
    * [[rollingBeta]] (which is one pair, trailing window; this is ALL
    * pairs, full sample). Input rows are (key, bucket, micro) with
    * `micro` the clamped micro-unit return ([[toMicro]]).
    *
    * Numeric policy: the five co-moment sums accumulate micro-unit
    * integer products as DECIMAL(38,0) (exact at any partitioning or
    * series length — a LONG sum of 1e14-sized products overflows past
    * ~90 k aligned buckets); the closed-form correlation then runs a
    * fixed sequence of double ops on identical operands, so both
    * engines land on the same bits. Pairs align via one bucket-keyed
    * self-join; keys-per-bucket is the series count (model-sized), so
    * the join fan-out is k² per bucket, never data × data.
    */
  def corrMatrix(rets: DataFrame, key: Column, bucket: Column,
      micro: Column): DataFrame = {
    val base = rets.select(key.as("__k"), bucket.as("__b"), micro.as("__m"))
    val a = base.select(col("__b"), col("__k").as("key_a"), col("__m").as("__ma"))
    val b = base.select(col("__b"), col("__k").as("key_b"), col("__m").as("__mb"))
    val dec = "decimal(38,0)"
    val agg = a.join(b, Seq("__b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("__ma").cast(dec)).as("__sx"),
        sum(col("__mb").cast(dec)).as("__sy"),
        sum((col("__ma") * col("__mb")).cast(dec)).as("__sxy"),
        sum((col("__ma") * col("__ma")).cast(dec)).as("__sxx"),
        sum((col("__mb") * col("__mb")).cast(dec)).as("__syy"))
    // The centered moments are computed EXACTLY in decimal before any
    // double enters: for a constant series with large n·m² the sums
    // exceed 2^53, and a double-computed variance is rounding noise
    // that can land slightly positive — emitting garbage where NULL
    // (zero variance) is the answer. Exact integers make the zero test
    // exact; the single double division afterwards runs on identical
    // operands in both engines. Magnitudes: |m| ≤ 9.99e6 (clamped), so
    // n·Σxx ≤ n²·1e14 — inside DECIMAL(38) up to n ≈ 1e12 buckets.
    val nDec = col("n").cast("decimal(20,0)")
    val num = (nDec * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val vxE = nDec * col("__sxx") - col("__sx") * col("__sx")
    val vyE = nDec * col("__syy") - col("__sy") * col("__sy")
    agg.withColumn("corr",
        when(vxE > 0 && vyE > 0,
          num / sqrt(vxE.cast("double") * vyE.cast("double"))))
      .select(col("key_a"), col("key_b"), col("n"), col("corr"))
  }
}
