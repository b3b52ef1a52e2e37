package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.time.LocalDate

/** Ingest framework (SURVEY §2.1 S1–S10, §2.10 D11–D13): the reference
  * wraps 8 vendor APIs with retry decorators, pagination walk-back and
  * date-range bisection under row limits. Vendor specifics are
  * acquisition-side; the *engine* abstractions are: a batch source that
  * yields a DataFrame for a key+range request, a retry policy, and the
  * range-splitting planners — kept as pure, unit-testable functions.
  */
trait BatchSource {
  /** Fetch rows for one key over [from, to] (inclusive). */
  def fetch(spark: SparkSession, key: String, from: LocalDate, to: LocalDate): DataFrame
}

/** Parquet-backed source used by tests and local pipelines. */
final class ParquetSource(path: String, keyCol: String, dateCol: String) extends BatchSource {
  import org.apache.spark.sql.functions._
  def fetch(spark: SparkSession, key: String, from: LocalDate, to: LocalDate): DataFrame =
    spark.read.parquet(path)
      .filter(col(keyCol) === key &&
        col(dateCol) >= lit(java.sql.Date.valueOf(from)) &&
        col(dateCol) <= lit(java.sql.Date.valueOf(to)))
}

/** Bounded retry with fixed backoff — the reference's 5×/1s (tushare),
  * 20×/0.2s (pytdx) decorators
  * (/root/reference/tasks/tushare/tushare_stock_daily/stock.py:45-48).
  */
final case class RetryPolicy(maxAttempts: Int, backoffMillis: Long) {
  def run[T](op: () => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return op()
      catch {
        case e: Throwable =>
          last = e; attempt += 1
          if (attempt < maxAttempts && backoffMillis > 0) Thread.sleep(backoffMillis)
      }
    }
    throw last
  }
}

object RangePlanners {

  /** D11 — recursive date-range bisection under a vendor row limit
    * (/root/reference/tasks/jqdata/stock/finance_report/__init__.py:35-64):
    * split [from,to] until `estimate(range) <= limit`, emitting the leaf
    * ranges in chronological order.
    */
  def bisect(from: LocalDate, to: LocalDate, limit: Long,
      estimate: (LocalDate, LocalDate) => Long): Seq[(LocalDate, LocalDate)] = {
    require(!from.isAfter(to))
    if (estimate(from, to) <= limit || from.isEqual(to)) Seq((from, to))
    else {
      val mid = from.plusDays(java.time.temporal.ChronoUnit.DAYS.between(from, to) / 2)
      bisect(from, mid, limit, estimate) ++ bisect(mid.plusDays(1), to, limit, estimate)
    }
  }

  /** D12 — pagination walk-back: newest-first pages keyed by the min
    * cursor of the previous page
    * (/root/reference/tasks/tushare/tushare_stock_daily/stock.py:186-208).
    * Pure driver: repeatedly calls `page(endCursor)` until it returns
    * None or the stop condition hits.
    */
  def walkBack[C, P](start: C, page: C => Option[(P, C)], stop: C => Boolean,
      maxPages: Int = 10000): Seq[P] = {
    val out = Seq.newBuilder[P]
    var cursor = start
    var n = 0
    var done = false
    while (!done && n < maxPages && !stop(cursor)) {
      page(cursor) match {
        case Some((p, next)) => out += p; cursor = next; n += 1
        case None => done = true
      }
    }
    out.result()
  }
}
