package graft

import graft.core.IncrementalPlanner
import graft.sources.{RangePlanners, RetryPolicy}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

class SourceSpec extends AnyFunSuite with SharedSpark {

  test("D11 bisection splits ranges until under the row limit") {
    val from = LocalDate.of(2020, 1, 1)
    val to = LocalDate.of(2020, 12, 31)
    // pretend 100 rows/day; limit 3000 → leaves must span ≤30 days
    val est = (a: LocalDate, b: LocalDate) =>
      (java.time.temporal.ChronoUnit.DAYS.between(a, b) + 1) * 100
    val leaves = RangePlanners.bisect(from, to, 3000, est)
    assert(leaves.head._1 == from && leaves.last._2 == to)
    // contiguous, ordered, no overlap
    leaves.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(s2 == e1.plusDays(1))
      case _ =>
    }
    assert(leaves.forall { case (a, b) => est(a, b) <= 3000 })
  }

  test("D12 pagination walk-back stops at the cursor floor") {
    // newest-first pages of 10, walk back from 100 to 35
    val pages = RangePlanners.walkBack[Int, Seq[Int]](
      start = 100,
      page = c => if (c <= 35) None else {
        val lo = math.max(c - 10, 35)
        Some(((lo until c).toSeq, lo))
      },
      stop = _ <= 35)
    assert(pages.flatten.sorted == (35 until 100).toSeq)
  }

  test("retry policy retries then surfaces the final failure") {
    var calls = 0
    val r = RetryPolicy(3, 0).run { () => calls += 1; if (calls < 3) sys.error("flaky") else 42 }
    assert(r == 42 && calls == 3)
    calls = 0
    val e = intercept[RuntimeException](RetryPolicy(2, 0).run { () => calls += 1; sys.error("down") })
    assert(e.getMessage == "down" && calls == 2)
  }

  test("D7 bisection recovers monotone membership exactly with ≪ linear fetches") {
    import graft.sources.ConstituentBisection
    import java.time.LocalDate
    // 400 weekdays; members join at a handful of change points and never
    // leave — the reference's constituent-history shape. Ground truth:
    val axis = ConstituentBisection.weekdayAxis(
      LocalDate.parse("2020-01-01"), LocalDate.parse("2021-07-15"))
    assert(axis.length > 390, s"axis too short: ${axis.length}")
    val joins = Map("AAA" -> 0, "BBB" -> 0, "CCC" -> 57, "DDD" -> 141,
      "EEE" -> 141, "FFF" -> 260, "GGG" -> 399)
    def membership(i: Int): Set[String] =
      joins.collect { case (m, j) if j <= i => m }.toSet
    val sampled = ConstituentBisection.sample(axis.length, membership)
    // every change point localized exactly
    val intervals = ConstituentBisection.memberIntervals(axis, sampled)
    assert(intervals.toSet == joins.map { case (m, j) =>
      (m, axis(j), axis.last) }.toSet, s"wrong intervals: $intervals")
    // the whole point: fetch count is O(changes · log axis), not O(axis)
    assert(sampled.fetchCount < axis.length / 5,
      s"bisection degenerated to linear: ${sampled.fetchCount} of ${axis.length}")
    assert(sampled.fetchCount >= 5, "implausibly few fetches — recursion broken")
  }

  test("D7 bisection fails fast on an event-sized membership axis (driver guard)") {
    import graft.sources.ConstituentBisection
    // The driver memoizes whole snapshots: a membership set past the
    // dimension-sized contract must throw with the actionable name, not
    // accumulate toward a driver OOM. Small maxMembers stands in for
    // MaxMembers so the test doesn't build million-element sets.
    val err = intercept[IllegalArgumentException] {
      ConstituentBisection.sample(10,
        i => (0 to i * 100).map(_.toString).toSet, maxMembers = 500)
    }
    assert(err.getMessage.contains("dimension-sized"), err.getMessage)
    // under the bound the same axis samples fine
    val ok = ConstituentBisection.sample(10,
      i => (0 to i).map(_.toString).toSet, maxMembers = 500)
    assert(ok.snapshots.nonEmpty)
  }

  test("D7 bisection: equal endpoints hide an interior flip (documented contract)") {
    import graft.sources.ConstituentBisection
    import java.time.LocalDate
    val axis = ConstituentBisection.weekdayAxis(
      LocalDate.parse("2020-01-01"), LocalDate.parse("2020-12-31"))
    // XXX leaves at index 100 and re-joins at 200: the enclosing
    // endpoints are EQUAL, so the recursion declares the whole axis
    // constant after exactly two fetches and the dip is missed — the
    // reference's contract (sectorconstituent.py:147-149), exact only
    // for monotone membership, which is why the oracled query uses
    // first-activity cohorts.
    def membership(i: Int): Set[String] =
      if (i < 100 || i >= 200) Set("XXX", "YYY") else Set("YYY")
    val sampled = ConstituentBisection.sample(axis.length, membership)
    assert(sampled.fetchCount == 2, s"expected 2 endpoint fetches, got ${sampled.fetchCount}")
    val got = ConstituentBisection.memberIntervals(axis, sampled).toSet
    assert(got == Set(("XXX", axis.head, axis.last), ("YYY", axis.head, axis.last)), got)
    // the reference's linear fallback (loop_get_data) catches the same
    // dip the bisection provably missed above, at O(axis) fetch cost
    val full = ConstituentBisection.sample(axis.length, membership, exhaustive = true)
    assert(full.fetchCount == axis.length)
    val exact = ConstituentBisection.memberIntervals(axis, full).toSet
    assert(exact == Set(
      ("XXX", axis.head, axis(99)), ("XXX", axis(200), axis.last),
      ("YYY", axis.head, axis.last)), exact)
  }

  test("watermark-incremental load ≡ full recompute (SURVEY §5.2)") {
    // Split the orders table at a watermark, load base then increment via
    // newerThanSink, and compare against loading everything at once.
    val all = core.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
    val base = all.filter(col("od") < lit("1998-01-01"))
    val increment = IncrementalPlanner.newerThanSink(all, base, "od")
    val recombined = base.unionByName(increment)
    assert(recombined.count() == all.count())
    assert(recombined.exceptAll(all).isEmpty && all.exceptAll(recombined).isEmpty)
  }
}
