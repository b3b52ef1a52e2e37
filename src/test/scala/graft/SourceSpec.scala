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
