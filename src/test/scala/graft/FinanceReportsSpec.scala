package graft

import graft.analytics.FinanceReports
import org.scalatest.funsuite.AnyFunSuite

class FinanceReportsSpec extends AnyFunSuite with SharedSpark {
  import java.sql.Date.{valueOf => d}

  test("D4 ytdToQuarterly matches the reference golden table") {
    // /root/reference/tasks/jqdata/stock/finance_report/__init__.py:347-384
    import spark.implicits._
    val reports = Seq(
      ("000001.XSHE", d("2000-12-31"), Some(400.0)),
      ("000001.XSHE", d("2001-03-31"), Option.empty[Double]),
      ("000001.XSHE", d("2001-06-30"), Some(600.0)),
      ("000001.XSHE", d("2001-09-30"), Option.empty[Double]),
      ("000001.XSHE", d("2001-12-31"), Some(1400.0)),
      ("000001.XSHE", d("2002-12-31"), Some(1600.0))
    ).toDF("code", "report_date", "ytd")
    val got = FinanceReports.ytdToQuarterly(spark, reports)
      .orderBy("report_date")
      .collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2000-12-31", 400.0, 100.0),
      ("2001-03-31", 100.0, 100.0), // back-filled YTD + carried season
      ("2001-06-30", 600.0, 500.0),
      ("2001-09-30", 1500.0, 500.0),
      ("2001-12-31", 1400.0, -100.0),
      ("2002-12-31", 1600.0, 400.0)))
  }

  test("D5 detects the YTD column and not the quarterly one") {
    // /root/reference/tasks/jqdata/stock/finance_report/__init__.py:387-414
    import spark.implicits._
    val dates = Seq(
      "2000-03-31", "2000-06-30", "2000-09-30", "2000-12-31",
      "2001-03-31", "2001-06-30", "2001-12-31",
      "2002-06-30", "2002-12-31",
      "2003-03-31", "2003-12-31").map(d(_))
    val revenue = Seq(Some(200.0), Some(400.0), Some(600.0), Some(800.0),
      None, Some(600.0), Some(1200.0), Some(700.0), Some(1400.0),
      Some(400.0), Some(1600.0))
    val seasonal = Seq(200.0, 200.0, 200.0, 200.0, 200.0, 400.0, 600.0,
      700.0, 700.0, 400.0, 400.0).map(Some(_))
    val df = dates.indices.map(i => ("c1", dates(i), revenue(i), seasonal(i)))
      .toDF("code", "report_date", "revenue", "revenue_season")
    val got = FinanceReports.detectAccumulationCols(df, "code", "report_date",
      Seq("revenue", "revenue_season"))
    assert(got == Seq("revenue"))
  }

  test("D6 expands reports over the calendar with [pub, next_pub) windows") {
    import spark.implicits._
    val reports = Seq(
      ("c1", d("2021-01-10"), d("2020-12-31"), 1.0),
      ("c1", d("2021-04-10"), d("2021-03-31"), 2.0),
      // restatement: same pub_date, later report_date must win
      ("c1", d("2021-04-10"), d("2021-04-05"), 3.0)
    ).toDF("code", "pub_date", "report_date", "val")
    val cal = Seq(d("2021-01-01"), d("2021-01-10"), d("2021-02-01"),
      d("2021-04-10"), d("2021-05-01"), d("2021-07-01"))
      .toDF("cal_date")
    val got = FinanceReports.reportToDaily(reports, cal,
      "code", "pub_date", "report_date", "cal_date", Seq("val"),
      horizon = d("2021-06-30"))
      .orderBy("cal_date")
      .collect()
      .map(r => (r.getDate(1).toString, r.getDate(3).toString, r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("2021-01-10", "2020-12-31", 1.0),
      ("2021-02-01", "2020-12-31", 1.0),
      ("2021-04-10", "2021-04-05", 3.0), // restated report visible from its pub date
      ("2021-05-01", "2021-04-05", 3.0)))
    // 2021-07-01 beyond horizon → excluded; 2021-01-01 before first pub → excluded
  }
}
