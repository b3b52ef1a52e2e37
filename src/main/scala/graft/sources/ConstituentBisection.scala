package graft.sources

import java.time.{DayOfWeek, LocalDate}
import scala.collection.immutable.SortedMap
import scala.collection.mutable

/** D7 — the acquisition-side constituent-history bisection driver
  * (/root/reference/tasks/wind/sectorconstituent.py:84-169,
  * /root/reference/tasks/wind/index_constituent.py:121-199): querying a
  * vendor for a sector's membership on every trade date is unaffordable,
  * so the reference fetches the two endpoints of a date interval and
  * declares the interval constant when the membership SETS are equal,
  * bisecting at the midpoint index otherwise, with per-date memoization.
  *
  * The recursion is pure driver control flow around an arbitrary
  * `fetch: Int => Set[K]` (a vendor call, or a Spark query collecting a
  * model-sized membership set) — the engine-side counterpart of the
  * reference's Celery task. Cost is O(changes · log(axis)) fetches
  * instead of O(axis).
  *
  * Exactness contract (same as the reference's): an interval with equal
  * endpoint sets is ASSUMED constant, so an A→B→A flip strictly inside
  * it is missed. For monotone membership (members join and never leave —
  * e.g. first-activity cohorts) equal endpoints imply true constancy and
  * the reconstruction is exact at every change point.
  */
object ConstituentBisection {

  /** Sampled snapshots by axis index, plus the number of distinct
    * `fetch` calls actually made (the memo guarantees ≤1 per index).
    */
  final case class Sampled[K](snapshots: SortedMap[Int, Set[K]], fetchCount: Int)

  /** Run the endpoint-equality recursion over axis indices
    * `[0, nDates)`. Invariant on return: any two CONSECUTIVE sampled
    * indices either hold equal sets or are adjacent on the axis — every
    * detected change is localized to its exact date.
    *
    * `exhaustive = true` switches to the reference's linear fallback
    * (`loop_get_data`, /root/reference/tasks/wind/index_constituent.py:178-199):
    * fetch EVERY index. O(axis) vendor calls instead of
    * O(changes · log axis), but exact even for the A→B→A flip strictly
    * inside an equal-endpoints interval that the bisection's contract
    * documents as missed — the knob an operator flips when membership
    * is known to be non-monotone and the axis is short enough to
    * afford it.
    */
  /** Hard ceiling on any membership snapshot the bisection driver holds.
    * The D7 contract is a DIMENSION-sized membership axis (the
    * reference's sectors are hundreds of codes; indexes a few thousand):
    * the driver memoizes O(changes · log axis) whole snapshots, so an
    * event-sized key (user ids of a 100 TB event table) would
    * accumulate on the driver far from the allocation site. Fail fast
    * with the actionable name instead — a membership axis wider than
    * this wants the engine's distributed interval operators, not the
    * acquisition-replay driver.
    */
  val MaxMembers: Int = 1 << 20

  def sample[K](nDates: Int, fetch: Int => Set[K],
      exhaustive: Boolean = false, maxMembers: Int = MaxMembers): Sampled[K] = {
    require(nDates > 0, "empty date axis")
    def checked(i: Int): Set[K] = {
      val s0 = fetch(i)
      require(s0.size <= maxMembers,
        s"constituent snapshot at axis index $i has ${s0.size} members " +
          s"(> $maxMembers): the bisection driver holds whole snapshots on " +
          "the driver and is scoped to dimension-sized membership axes " +
          "(see MaxMembers); distribute event-sized membership instead")
      s0
    }
    if (exhaustive)
      return Sampled(SortedMap.from((0 until nDates).map(i => i -> checked(i))), nDates)
    val memo = mutable.SortedMap.empty[Int, Set[K]]
    var calls = 0
    def get(i: Int): Set[K] =
      memo.getOrElseUpdate(i, { calls += 1; checked(i) })
    def rec(s: Int, e: Int): Unit = {
      val left = get(s)
      val right = get(e)
      if (left != right) {
        val mid = (s + e) / 2
        if (mid != s) {
          rec(s, mid)
          // ref sectorconstituent.py:161-168 — if the midpoint equals the
          // right endpoint the right half is constant; else refine it too
          if (get(mid) != right) rec(mid, e)
        }
      }
    }
    rec(0, nDates - 1)
    Sampled(SortedMap.from(memo), calls)
  }

  /** Collapse sampled snapshots into per-member intervals
    * `(member, from, to)` — both endpoints inclusive axis dates. A
    * member leaving at sampled index i was last present on `dates(i-1)`;
    * a member re-joining later opens a second interval. This is the
    * interval table the J12 calendar expansion consumes
    * ([[graft.operators.AsOfJoin]]).
    */
  def memberIntervals[K](dates: IndexedSeq[LocalDate],
      s: Sampled[K]): Seq[(K, LocalDate, LocalDate)] = {
    require(dates.nonEmpty && s.snapshots.nonEmpty, "nothing sampled")
    val out = Seq.newBuilder[(K, LocalDate, LocalDate)]
    val open = mutable.LinkedHashMap.empty[K, LocalDate]
    var prev = Set.empty[K]
    for ((i, cur) <- s.snapshots) {
      for (m <- prev if !cur.contains(m))
        out += ((m, open.remove(m).get, dates(i - 1)))
      for (m <- cur if !open.contains(m))
        open(m) = dates(i)
      prev = cur
    }
    for ((m, from) <- open) out += ((m, from, dates.last))
    out.result()
  }

  /** Weekday (Mon–Fri) axis over [from, to] inclusive — the local stand-
    * in for the reference's exchange trade-date list. */
  def weekdayAxis(from: LocalDate, to: LocalDate): IndexedSeq[LocalDate] = {
    require(!from.isAfter(to), s"bad axis [$from, $to]")
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to))
      .filter(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
        d.getDayOfWeek != DayOfWeek.SUNDAY)
      .toIndexedSeq
  }
}
