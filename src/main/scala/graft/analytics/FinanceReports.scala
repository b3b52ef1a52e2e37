package graft.analytics

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quarterly-report pipelines (SURVEY §2.10 D4/D5/D6), re-expressed
  * Spark-first. The order-dependent YTD→quarterly conversion keeps the
  * reference's per-code sequential semantics via `groupByKey.flatMapGroups`
  * (each group is one instrument's report history — small and bounded, so
  * per-group sequential scan scales by partitioning across codes).
  */
object FinanceReports {

  case class ReportRow(code: String, report_date: java.sql.Date, ytd: Option[Double])
  case class SeasonRow(code: String, report_date: java.sql.Date,
      ytd_filled: Option[Double], season: Option[Double])

  /** D4 — `fill_season_data`
    * (/root/reference/tasks/jqdata/stock/finance_report/__init__.py:271-344):
    * YTD-cumulative quarterly series → per-quarter values.
    *
    * Per code, reports sorted by report_date (months ∈ {3,6,9,12}):
    *  1. prev YTD + curr YTD present, same year → season =
    *     (ytd−prevYtd)/((month−prevMonth)/3)
    *  2. curr present, (prev missing or year changed) → season =
    *     ytd/(month/3)
    *  3. prev present, curr missing → season carries forward and the
    *     YTD value is back-filled linearly: ytd := season·(month/3)
    *  4. both missing → null.
    * Golden case: YTD [400,∅,600,∅,1400,1600] →
    * season [100,100,500,500,−100,400] (reference `_test_fill_season_data`).
    */
  def ytdToQuarterly(spark: SparkSession, reports: DataFrame,
      codeCol: String = "code", dateCol: String = "report_date",
      ytdCol: String = "ytd"): DataFrame = {
    import spark.implicits._
    val ds = reports.select(
      col(codeCol).cast("string").as("code"),
      col(dateCol).cast("date").as("report_date"),
      col(ytdCol).cast("double").as("ytd")).as[ReportRow]
    ds.groupByKey(_.code)
      .flatMapGroups { (code, it) =>
        val rows = it.toArray.sortBy(_.report_date.toLocalDate.toEpochDay)
        var lastYtd: Option[Double] = None // post-backfill YTD of prev row
        var lastSeason: Option[Double] = None
        var lastDate: Option[java.time.LocalDate] = None
        rows.iterator.map { r =>
          val d = r.report_date.toLocalDate
          val m = d.getMonthValue
          val sameYear = lastDate.exists(_.getYear == d.getYear)
          val (ytdFilled, season): (Option[Double], Option[Double]) =
            if (lastYtd.isDefined && r.ytd.isDefined && sameYear)
              // case 1: in-year diff, scaled by quarters elapsed
              (r.ytd, Some((r.ytd.get - lastYtd.get) /
                ((m - lastDate.get.getMonthValue) / 3.0)))
            else if (r.ytd.isDefined)
              // case 2: first usable report of the year → de-cumulate
              (r.ytd, Some(r.ytd.get / (m / 3.0)))
            else if (lastYtd.isDefined)
              // case 3: missing YTD → carry prev season, back-fill YTD
              // linearly (reference mutates the YTD column too)
              lastSeason match {
                case Some(sn) => (Some(sn * (m / 3.0)), Some(sn))
                case None => (None, None)
              }
            else (None, None)
          lastYtd = ytdFilled
          lastSeason = season
          lastDate = Some(d)
          SeasonRow(code, r.report_date, ytdFilled, season)
        }
      }(Encoders.product[SeasonRow])
      .toDF()
  }

  /** D5 — `check_accumulation_cols`
    * (/root/reference/tasks/jqdata/stock/finance_report/__init__.py:219-268):
    * profile which numeric report columns are YTD-cumulative. A column
    * fits when, across ≥3 year boundaries (Dec→Q1/H1), it grew
    * monotonically within the year then dropped at the boundary, in
    * >50% of boundaries. Relational implementation: window lags +
    * conditional counts, one pass per column.
    */
  def detectAccumulationCols(reports: DataFrame, codeCol: String,
      dateCol: String, candidateCols: Seq[String]): Seq[String] = {
    // Melt the candidate columns into long format so ONE window + ONE
    // aggregation profiles all of them in a single job. The reference
    // (and the first cut here) looped columns on the driver, re-scanning
    // the reports table per column — N sequential full scans at 100 TB.
    // Per (column, code): non-null series ordered by date, exactly the
    // per-column filter semantics of the original loop.
    val melted = reports.select(
      col(codeCol).as("code"), col(dateCol).cast("date").as("rd"),
      explode(array(candidateCols.map(c =>
        struct(lit(c).as("cname"), col(c).cast("double").as("v"))): _*)).as("m"))
      .select(col("code"), col("rd"), col("m.cname").as("cname"), col("m.v").as("v"))
      .filter(col("v").isNotNull)
    val w = Window.partitionBy(col("cname"), col("code")).orderBy(col("rd"))
    val lagged = melted
      .withColumn("prev_rd", lag(col("rd"), 1).over(w))
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .withColumn("y", year(col("rd"))).withColumn("m", month(col("rd")))
      .withColumn("prev_y", year(col("prev_rd"))).withColumn("prev_m", month(col("prev_rd")))
    // Within-year growth flag per (column, code, year): all steps grow.
    val growth = lagged.filter(col("prev_rd").isNotNull && col("y") === col("prev_y"))
      .groupBy(col("cname"), col("code"), col("y"))
      .agg(min((col("v") > col("prev_v")).cast("int")).as("grew_all"))
      .select(col("cname").as("g_cname"), col("code").as("g_code"),
        col("y").as("g_y"), col("grew_all"))
    // Year-boundary rows: Dec report followed by Q1/H1 report.
    val boundaries = lagged.filter(col("prev_rd").isNotNull && col("y") =!= col("prev_y") &&
      col("prev_m") === 12 && col("m").isin(3, 6))
      .withColumn("down", (col("v") < col("prev_v")).cast("int"))
    val joined = boundaries.join(growth,
      col("cname") === col("g_cname") && col("code") === col("g_code") &&
        col("prev_y") === col("g_y"), "left")
    // One row per candidate column — the only driver-side collect.
    val verdicts = joined.groupBy(col("cname"))
      .agg(count(lit(1)).as("available"),
        sum((col("down") === 1 && coalesce(col("grew_all"), lit(0)) === 1).cast("int")).as("fit"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toMap
    candidateCols.filter { c =>
      val (available, fit) = verdicts.getOrElse(c, (0L, 0L))
      available >= 3 && fit.toDouble / available > 0.5
    }
  }

  /** D6 — report→daily as-of expansion
    * (/root/reference/tasks/jqdata/stock/finance_report/__init__.py:456-565):
    * latest report per (code, pub_date) → validity window
    * [pub_date, next_pub_date) → one output row per calendar date in the
    * window. Fully relational: A6 dedup + W1 lead + J12 calendar join.
    */
  def reportToDaily(reports: DataFrame, calendar: DataFrame,
      codeCol: String, pubDateCol: String, reportDateCol: String,
      calDateCol: String, valueCols: Seq[String],
      horizon: java.sql.Date): DataFrame = {
    // A6: keep latest report_date per (code, pub_date).
    val w = Window.partitionBy(col(codeCol), col(pubDateCol))
      .orderBy(col(reportDateCol).desc)
    val latest = reports.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // W1: next pub date bounds the validity window.
    val wNext = Window.partitionBy(col(codeCol)).orderBy(col(pubDateCol))
    val windowed = latest.withColumn("__until",
      coalesce(lead(col(pubDateCol), 1).over(wNext), lit(horizon)))
    // J12: expand to calendar dates.
    AsOfJoin.expandToCalendar(windowed, calendar, calDateCol, pubDateCol, "__until")
      .select((Seq(col(codeCol), col(calDateCol), col(pubDateCol), col(reportDateCol)) ++
        valueCols.map(col)): _*)
  }
}
