package graft

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan) is
  * pinned two ways: value-differentially against the union-and-carry
  * formulation on randomized data, and by plan shape (the custom exec
  * node actually plans, with the declared two-exchange sort-merge form).
  */
class AsOfNativeSpec extends AnyFunSuite with SharedSpark {

  test("native as-of equals union-and-carry on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Left times even, right times odd and unique per key: no cross-side
    // ties (tie semantics get their own test) and no right-side tie
    // ambiguity in either implementation.
    val lrows = (1 to 3000).map(i => (s"k${rnd.nextInt(30)}", rnd.nextInt(5000) * 2, i))
    val rrows = (0 until 35).flatMap { k =>
      rnd.shuffle((0 until 5000).toList).take(60).map(t => (s"k$k", t * 2 + 1,
        if (rnd.nextBoolean()) Some(rnd.nextDouble()) else None))
    }
    val left = lrows.toDF("key", "t", "row_id")
    val right = rrows.toDF("key", "rt", "v")
    val native = AsOfJoinPlan.asofBackwardNative(left, right, Seq("key"),
      leftTime = "t", rightTime = "rt", valueCols = Seq("v"))
    val carry = AsOfJoin.asofBackward(left, right, Seq("key"),
      leftTime = "t", rightTime = "rt", valueCols = Seq("v"))
    val n = native.orderBy("row_id").collect()
    val c = carry.orderBy("row_id").collect()
    assert(n.length == c.length && n.length == 3000)
    assert(n.sameElements(c), {
      val diff = n.zip(c).filter { case (a, b) => a != b }.take(5)
      s"native vs carry diverge on ${diff.length}+ rows, e.g. $diff"
    })
  }

  test("equal timestamps are inclusive; stale matches clear across key groups") {
    import spark.implicits._
    val left = Seq(("k1", 5, 1), ("k1", 2, 2), ("k2", 9, 3), ("k3", 9, 4))
      .toDF("key", "t", "row_id")
    val right = Seq(("k1", 3, "B"), ("k1", 5, "A"), ("k1", 7, "C"), ("k2", 1, "D"))
      .toDF("key", "rt", "v")
    val out = AsOfJoinPlan.asofBackwardNative(left, right, Seq("key"), "t", "rt", Seq("v"))
      .orderBy("row_id").collect().map(r => (r.getInt(2), Option(r.getString(3))))
    // row 1: right@5 visible at t=5 (inclusive); row 2: nothing ≤ 2;
    // row 3: k2 matches D, k1's C must not leak; row 4: k3 has no rights.
    assert(out.toSeq == Seq((1, Some("A")), (2, None), (3, Some("D")), (4, None)))
  }

  test("a matched right row with a null value field stays a row-level match") {
    import spark.implicits._
    val left = Seq(("k1", 10, 1)).toDF("key", "t", "row_id")
    val right = Seq(("k1", 3, Some(1.5)), ("k1", 8, None: Option[Double]))
      .toDF("key", "rt", "v")
    val out = AsOfJoinPlan.asofBackwardNative(left, right, Seq("key"), "t", "rt", Seq("v"))
      .collect()
    // The LATEST right row (t=8) matches even though its value is null —
    // row-level as-of semantics, same as the struct-carry formulation.
    assert(out.head.isNullAt(3))
  }

  test("right rows tied on (key, time) pin to the largest value tuple in BOTH kernels") {
    import spark.implicits._
    // Three purchases at the SAME timestamp: without a declared tie
    // order the winner depends on partition-internal sort order (round-8
    // advice). Contract: the largest value tuple wins — in the window
    // form via the value-struct sort key, in the native form via the
    // right child's declared (keys, time, values) ordering — matching
    // the oracle's `ORDER BY ts DESC, value DESC` QUALIFY.
    val left = Seq(("k1", 10, 1), ("k2", 10, 2)).toDF("key", "t", "row_id")
    val right = Seq(
      ("k1", 5, 2.0), ("k1", 5, 9.0), ("k1", 5, 4.0),
      ("k2", 10, 1.0), ("k2", 10, 3.0), ("k2", 3, 8.0)
    ).toDF("key", "rt", "v")
    for (parts <- Seq(1, 3, 7)) {
      val l = left.repartition(parts); val r = right.repartition(parts)
      val native = AsOfJoinPlan.asofBackwardNative(l, r, Seq("key"), "t", "rt", Seq("v"))
        .orderBy("row_id").collect().map(_.getDouble(3)).toSeq
      val carry = AsOfJoin.asofBackward(l, r, Seq("key"), "t", "rt", Seq("v"))
        .orderBy("row_id").collect().map(_.getDouble(3)).toSeq
      assert(native == Seq(9.0, 3.0), s"parts=$parts native tie unpinned: $native")
      assert(carry == Seq(9.0, 3.0), s"parts=$parts carry tie unpinned: $carry")
    }
  }

  test("the custom strategy plans AsOfJoinExec in sort-merge shape") {
    import spark.implicits._
    val left = (1 to 100).map(i => (s"k${i % 7}", i, i)).toDF("key", "t", "row_id")
    val right = (1 to 50).map(i => (s"k${i % 9}", i, i * 1.0)).toDF("key", "rt", "v")
    val df = AsOfJoinPlan.asofBackwardNative(left, right, Seq("key"), "t", "rt", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec did not plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("WindowExec"),
      s"as-of fell back to a non-native shape:\n$plan")
    // Declared requirements materialize as one hash exchange per side
    // (EnsureRequirements runs in executedPlan preparation, so sparkPlan
    // wouldn't show them).
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges == 2,
      s"expected 2 key exchanges:\n${df.queryExecution.executedPlan}")
  }
}
