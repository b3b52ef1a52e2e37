package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** W3 — product aggregate/window function for back-adjustment factor
  * chains (`cumprod`, /root/reference/tasks/wind/future_reorg/reversion_rights_factor.py:227-229,
  * /root/reference/tasks/tushare/tushare_future/continuse_contract_md.py:356-357).
  *
  * Spark has no `product`; `exp(sum(log))` breaks on zero/negative
  * ratios, so a tiny typed [[Aggregator]] is the honest implementation
  * (SURVEY §4.3). Nulls are skipped, matching pandas `cumprod` over a
  * series with NaN dropped upstream.
  */
object ProductAgg {
  private val agg: Aggregator[java.lang.Double, Double, Double] =
    new Aggregator[java.lang.Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: java.lang.Double): Double =
        if (a == null) b else b * a.doubleValue()
      def merge(b1: Double, b2: Double): Double = b1 * b2
      def finish(r: Double): Double = r
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** `product(col)` — usable in `agg` and as a window function. */
  val product: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(agg)

  def productOf(c: Column): Column = product(c)
}
