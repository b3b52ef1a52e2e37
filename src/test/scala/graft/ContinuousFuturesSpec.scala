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

  /** Randomized multi-year fixture: contracts expiring monthly across
    * 2019–2022 (≥4 of the ~year-wide replay slices), each quoting in a
    * window before its expiry with random gaps, null volumes and tied
    * volumes (small integer range forces ties). Rolls happen at every
    * slice boundary neighborhood, so the sliced replay's seeds are
    * exercised mid-stream, not just at cold start.
    */
  private def randomBars(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    import java.time.LocalDate
    val rows = for {
      t <- Seq("T0", "T1", "T2")
      c <- 0 until 24 // monthly expiries over 4 years
      expiry = LocalDate.of(2019, 1, 20).plusMonths(c * 2L)
      id = f"$t-C$c%02d"
      d <- 0 until 120 // quote window: ~4 months before expiry
      day = expiry.minusDays(120L - d)
      if rnd.nextDouble() < 0.7 // random quoting gaps
    } yield (t, id, java.sql.Date.valueOf(day),
      if (rnd.nextDouble() < 0.05) Option.empty[Double] else Some(10.0 + rnd.nextInt(50)),
      if (rnd.nextDouble() < 0.1) Option.empty[Double] else Some(rnd.nextInt(8).toDouble),
      java.sql.Date.valueOf(expiry))
    import spark.implicits._
    rows.toDF("instrument_type", "instrument_id", "trade_date", "close",
      "switch_by", "last_trade_date")
  }

  test("two-phase sliced selection ≡ legacy whole-bar scan (randomized, multi-slice)") {
    for (seed <- Seq(1, 7, 42)) {
      val bars = randomBars(seed)
      val got = ContinuousFutures.dailySelection(spark, bars)
        .collect().map(r => (r.getString(0), r.getDate(1).toString,
          r.getString(2), Option(r.getString(3)))).sortBy(x => (x._1, x._2))
      val want = ContinuousFutures.legacyScan(spark, bars, Division)._1
        .collect().map(r => (r.getString(0), r.getDate(1).toString,
          r.getString(2), Option(r.getString(3)))).sortBy(x => (x._1, x._2))
      assert(got.length == want.length, s"seed=$seed row counts differ")
      assert(got.toSeq == want.toSeq, s"seed=$seed selections diverge")
      // the fixture must actually span multiple replay slices
      assert(got.map(_._2.take(4)).distinct.length >= 3, s"seed=$seed fixture too narrow")
    }
  }

  test("two-phase factor scan ≡ legacy whole-bar scan (randomized)") {
    for (seed <- Seq(3, 11); method <- Seq(Division, Diff)) {
      val bars = randomBars(seed)
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getDate(1).toString, r.getString(2),
          math.rint(r.getDouble(3) * 1e9), Option(r.getString(4)),
          math.rint(r.getDouble(5) * 1e9))
      val got = ContinuousFutures.adjFactors(spark, bars, method)
        .collect().map(key).sortBy(x => (x._1, x._2))
      val want = ContinuousFutures.legacyScan(spark, bars, method)._2
        .collect().map(key).sortBy(x => (x._1, x._2))
      assert(got.toSeq == want.toSeq, s"seed=$seed method=$method factors diverge")
      assert(got.nonEmpty, s"seed=$seed produced no rolls")
    }
  }

  test("sliced factor scan ≡ serial whole-type scan, BIT-exact (randomized)") {
    // The round-11 sliced adjFactors claims identical operand order in
    // the reverse cumulation — so equality here is on raw doubles, no
    // rounding shim.
    for (seed <- Seq(5, 23); method <- Seq(Division, Diff)) {
      val bars = randomBars(seed)
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getDate(1).toString, r.getString(2),
          r.getDouble(3), Option(r.getString(4)), r.getDouble(5))
      val got = ContinuousFutures.adjFactors(spark, bars, method)
        .collect().map(key).sortBy(x => (x._1, x._2))
      val want = ContinuousFutures.adjFactorsSerial(spark, bars, method)
        .collect().map(key).sortBy(x => (x._1, x._2))
      assert(got.toSeq == want.toSeq, s"seed=$seed method=$method not bit-identical")
      assert(got.nonEmpty)
    }
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
