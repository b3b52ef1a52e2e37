package graft

import graft.analytics.ContinuousFutures
import graft.analytics.ContinuousFutures.{Diff, Division}
import org.scalatest.funsuite.AnyFunSuite

/** Golden scenario per FIXTURES.md §7: three contracts, two volume-driven
  * rolls; expected selections/factors computed by hand from the
  * reference's algorithm
  * (/root/reference/tasks/wind/future_reorg/reversion_rights_factor.py:94-211).
  */
class ContinuousFuturesSpec extends AnyFunSuite with SharedSpark {
  import java.sql.Date.{valueOf => d}

  private def bars = {
    val rows = Seq(
      // (id, date, close, vol, maturity)
      ("A", "2021-01-04", 10.0, 100.0), ("B", "2021-01-04", 12.0, 50.0),
      ("A", "2021-01-05", 11.0, 80.0), ("B", "2021-01-05", 13.0, 90.0),
      ("B", "2021-01-06", 13.0, 100.0), ("C", "2021-01-06", 15.0, 40.0),
      ("B", "2021-01-07", 14.0, 60.0), ("C", "2021-01-07", 16.0, 80.0),
      ("C", "2021-01-08", 17.0, 90.0))
    val maturity = Map("A" -> "2021-01-15", "B" -> "2021-05-15", "C" -> "2021-09-15")
    import spark.implicits._
    rows.map { case (id, dt, close, vol) =>
      ("RB", id, d(dt), close, vol, d(maturity(id)))
    }.toDF("instrument_type", "instrument_id", "trade_date", "close", "switch_by", "last_trade_date")
  }

  test("D1 dominant/secondary selection never rolls backward") {
    val sel = ContinuousFutures.dailySelection(spark, bars)
      .collect().map(r => (r.getDate(1).toString, r.getString(2), Option(r.getString(3))))
      .sortBy(_._1)
    assert(sel.toSeq == Seq(
      ("2021-01-04", "A", Some("B")),
      ("2021-01-05", "B", None),
      ("2021-01-06", "B", Some("C")),
      ("2021-01-07", "C", None),
      ("2021-01-08", "C", None)))
  }

  test("D2 division factors reverse-cumulate to 1 at the latest date") {
    val fac = ContinuousFutures.adjFactors(spark, bars, Division)
      .collect().map(r => (r.getDate(1).toString, r.getString(2), r.getDouble(3)))
      .sortBy(_._1)
    val r1 = 12.0 / 10.0 // roll A→B priced at 2021-01-04
    val r2 = 15.0 / 13.0 // roll B→C priced at 2021-01-06
    assert(fac.map(_._1).toSeq == Seq("2021-01-04", "2021-01-06", "2021-01-08"))
    assert(fac.map(_._2).toSeq == Seq("A", "B", "C"))
    val got = fac.map(_._3)
    assert(math.abs(got(0) - r1 * r2) < 1e-12)
    assert(math.abs(got(1) - r2) < 1e-12)
    assert(got(2) == 1.0)
  }

  test("D2 diff factors cumulate differences, 0 at latest date") {
    val fac = ContinuousFutures.adjFactors(spark, bars, Diff)
      .collect().map(r => (r.getDate(1).toString, r.getDouble(3))).sortBy(_._1)
    assert(fac.map(_._2).toSeq == Seq((12.0 - 10.0) + (15.0 - 13.0), 15.0 - 13.0, 0.0))
  }

  test("D3 adjusted series is continuous across the roll boundary") {
    val cs = ContinuousFutures.continuousSeries(spark, bars, Division)
      .collect().map(r => r.getDate(1).toString -> r.getDouble(5)).toMap
    // On roll-pricing day 01-04: old main A at 10×(r1·r2) ≡ new main B at 12×r2.
    val r1 = 12.0 / 10.0; val r2 = 15.0 / 13.0
    assert(math.abs(cs("2021-01-04") - 10.0 * r1 * r2) < 1e-9)
    assert(math.abs(cs("2021-01-05") - 13.0 * r2) < 1e-9)
    assert(math.abs(cs("2021-01-06") - 13.0 * r2) < 1e-9)
    assert(math.abs(cs("2021-01-08") - 17.0) < 1e-9)
    // continuity: adjusted old == adjusted new at the pricing date
    assert(math.abs(10.0 * r1 * r2 - 12.0 * r2) < 1e-9)
  }

  test("D1 missing-volume day falls back without a spurious roll") {
    import spark.implicits._
    val withGap = bars.union(Seq(
      ("RB", "C", d("2021-01-09"), 18.0, Option.empty[Double], d("2021-09-15"))
    ).toDF("instrument_type", "instrument_id", "trade_date", "close", "switch_by", "last_trade_date"))
    val sel = ContinuousFutures.dailySelection(spark, withGap)
    // day with no switch_by data contributes no selection row
    assert(sel.count() == 5)
  }
}
