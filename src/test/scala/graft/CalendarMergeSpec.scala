package graft

import graft.core.TradeCalendar
import graft.operators.MergeOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CalendarMergeSpec extends AnyFunSuite with SharedSpark {
  import java.sql.Date.{valueOf => d}

  private lazy val cal = new TradeCalendar(
    TradeCalendar.weekdays(spark, "2021-01-01", "2021-01-31",
      holidays = Seq("2021-01-18"))) // a Monday holiday

  test("nextOpen skips weekends and holidays") {
    import spark.implicits._
    val df = Seq(("a", d("2021-01-16")), ("b", d("2021-01-18")), ("c", d("2021-01-19")))
      .toDF("id", "dt")
    val got = cal.nextOpen(df, col("dt"), "next_open")
      .orderBy("id").collect().map(r => (r.getString(0), r.getDate(2).toString))
    // 16th is a Saturday, 18th a holiday → both land on Tuesday the 19th
    assert(got.toSeq == Seq(("a", "2021-01-19"), ("b", "2021-01-19"), ("c", "2021-01-19")))
  }

  test("clampToOpen walks back to the last open session") {
    import spark.implicits._
    val df = Seq(("a", d("2021-01-17"))).toDF("id", "dt") // Sunday
    val got = cal.clampToOpen(df, col("dt"), "prev_open").collect()
    assert(got.head.getDate(2).toString == "2021-01-15") // Friday
  }

  test("F10 cutoff: before 16:00 local the effective as-of is yesterday") {
    val zone = java.time.ZoneId.of("Asia/Shanghai")
    val before = java.time.Instant.parse("2021-06-15T06:00:00Z") // 14:00 CST
    val after = java.time.Instant.parse("2021-06-15T09:30:00Z") // 17:30 CST
    assert(TradeCalendar.effectiveAsOf(before, 16, zone).toString == "2021-06-14")
    assert(TradeCalendar.effectiveAsOf(after, 16, zone).toString == "2021-06-15")
  }

  test("F5 max_up_or_down: full reconciliation matrix") {
    import spark.implicits._
    val cases = Seq(
      ("涨停", Some(1), 1), // agree
      ("跌停", Some(-1), -1), // agree
      ("停牌", Some(0), 0), // neutral states map to 0
      ("非涨跌停", Some(0), 0),
      ("涨停", Some(7), 1), // wind invalid → ths wins
      ("??", Some(-1), -1), // ths unknown → wind wins
      ("??", Some(9), -2), // both unknown
      ("涨停", Some(-1), -3), // conflict
      ("停牌", Some(1), -3)) // neutral vs limit-up conflict
    val df = cases.zipWithIndex
      .map { case ((t, w, want), i) => (i, t, w.get, want) }
      .toDF("i", "ths", "wind", "want")
    val got = df.withColumn("got",
      MergeOps.maxUpOrDown(col("ths"), col("wind")))
      .filter(col("got") =!= col("want"))
    assert(got.count() == 0)
  }

  test("reconcileWithConflicts emits one row per out-of-tolerance cell") {
    import spark.implicits._
    val va = Seq((1, 100.0, 5.0), (2, 200.0, 6.0), (3, 300.0, 7.0))
      .toDF("k", "px", "qty")
    val vb = Seq((1, 100.4, 5.0), (2, 250.0, 9.0), (4, 400.0, 8.0))
      .toDF("k", "px", "qty")
    val (merged, conflicts) = MergeOps.reconcileWithConflicts(
      va, vb, Seq("k"),
      rules = Seq("px" -> MergeOps.preferLeft, "qty" -> ((l, r) => MergeOps.meanValue(l, r))),
      numericCols = Seq("px", "qty"), tol = 0.01)
    assert(merged.count() == 4) // full outer: keys 1,2,3,4
    val c = conflicts.orderBy("k", "column").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    // k=1 px: |100-100.4|/100.4 < 1% → no conflict; k=2 px and qty both conflict
    assert(c.toSeq == Seq((2, "px", 200.0, 250.0), (2, "qty", 6.0, 9.0)))
  }
}
