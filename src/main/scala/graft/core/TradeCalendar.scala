package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trade-calendar helpers (SURVEY §7.1 module 2): next-open-date lookup,
  * clamp-to-open, and the business-day cutoff the reference hard-coded as
  * `hour(now())<16` in server-local time
  * (/root/reference/tasks/tushare/tushare_stock_daily/stock.py:125-155)
  * — here parameterized by hour and zone (the engine session runs UTC).
  *
  * The calendar is a tiny dimension (decades × exchanges ≈ 10⁴ rows):
  * always broadcast, never shuffled.
  */
final class TradeCalendar(calendar: DataFrame, dateCol: String = "cal_date",
    openCol: String = "is_open") extends Serializable {

  def openDates: DataFrame =
    calendar.filter(col(openCol) === 1).select(col(dateCol).as("open_date"))

  /** The open-date set, collected once (a calendar is decades ×
    * exchanges ≈ 10⁴ rows) and shipped in task closures — every lookup
    * is then an executor-local binary search instead of a non-equi
    * range join that explodes to rows×future-dates before aggregating.
    */
  private lazy val openEpochs: Array[Long] = openDates
    .select(col("open_date").cast("date")).distinct()
    .collect().map(_.getDate(0).toLocalDate.toEpochDay).sorted

  private def lookupUdf(pick: (Array[Long], Long) => Option[Long]) = {
    val days = openEpochs
    udf { d: java.sql.Date =>
      if (d == null) None
      else pick(days, d.toLocalDate.toEpochDay)
        .map(e => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(e)))
    }
  }

  private def ceilSearch(days: Array[Long], e: Long): Option[Long] = {
    var lo = 0; var hi = days.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (days(m) < e) lo = m + 1 else hi = m }
    if (lo < days.length) Some(days(lo)) else None
  }

  private def floorSearch(days: Array[Long], e: Long): Option[Long] = {
    var lo = 0; var hi = days.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (days(m) <= e) lo = m + 1 else hi = m }
    if (lo > 0) Some(days(lo - 1)) else None
  }

  /** For each input row, the first open date ≥ (or > if strict) `d`. */
  def nextOpen(df: DataFrame, d: Column, as: String, strict: Boolean = false): DataFrame = {
    val u =
      if (strict) lookupUdf((days, e) => ceilSearch(days, e + 1))
      else lookupUdf(ceilSearch)
    df.withColumn(as, u(d.cast("date")))
  }

  /** Clamp a date column down to the latest open date ≤ it. */
  def clampToOpen(df: DataFrame, d: Column, as: String): DataFrame =
    df.withColumn(as, lookupUdf(floorSearch)(d.cast("date")))

  /** Membership test: is `d` an open date? */
  def isOpen(df: DataFrame, d: Column, as: String): DataFrame = {
    val days = openEpochs
    val u = udf { dd: java.sql.Date =>
      dd != null && java.util.Arrays.binarySearch(days, dd.toLocalDate.toEpochDay) >= 0
    }
    df.withColumn(as, u(d.cast("date")))
  }
}

object TradeCalendar {

  /** Effective "today" for incremental loads: before `cutoffHour` in
    * `zone`, yesterday's session is the last complete one (F10).
    * Deterministic variant takes an explicit now.
    */
  def effectiveAsOf(nowUtc: java.time.Instant, cutoffHour: Int,
      zone: java.time.ZoneId): java.time.LocalDate = {
    val local = nowUtc.atZone(zone)
    if (local.getHour < cutoffHour) local.toLocalDate.minusDays(1) else local.toLocalDate
  }

  /** Column form for use in plans: caller supplies the clock as a
    * literal timestamp to keep runs reproducible. */
  def effectiveAsOfCol(nowTs: Column, cutoffHour: Int): Column =
    when(hour(nowTs) < cutoffHour, date_sub(to_date(nowTs), 1)).otherwise(to_date(nowTs))

  /** Build a weekday calendar DataFrame (for tests / synthetic runs). */
  def weekdays(spark: SparkSession, from: String, to: String,
      holidays: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val hol = holidays.toSet
    val start = java.time.LocalDate.parse(from)
    val days = Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(java.time.LocalDate.parse(to))).toSeq
    days.map { d =>
      val open = d.getDayOfWeek.getValue <= 5 && !hol.contains(d.toString)
      (java.sql.Date.valueOf(d), if (open) 1 else 0)
    }.toDF("cal_date", "is_open")
  }
}
