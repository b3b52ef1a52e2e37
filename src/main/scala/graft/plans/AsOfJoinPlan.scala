package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution,
  Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join as a whole-operator Catalyst extension: a custom
  * `LogicalPlan` node, a planner `SparkStrategy`, and a sort-merge
  * `SparkPlan` — the (c)-tier of the custom-operator ladder (compose →
  * expression → plan+strategy), used here for the engine's single most
  * distinctive operator (SURVEY §2.4 J8: report→daily as-of expansion,
  * /root/reference/tasks/jqdata/stock/finance_report/__init__.py:456-565).
  *
  * Execution shape (what a plan-native as-of buys at 100 TB): both sides
  * hash-partition on the match keys and sort within partitions on
  * (keys, time) — the SAME shape Spark plans for an equi sort-merge
  * join — then a single zipPartitions merge streams each partition pair
  * once with O(1) carried state (the latest right row). No window
  * function, no union, no per-key buffering: strictly fewer passes than
  * the union-and-carry formulation ([[graft.operators.AsOfJoin
  * .asofBackward]]), which must union both sides into one sort and
  * window-carry the struct. Requirements are declared, not hand-built:
  * `EnsureRequirements` inserts the exchanges/sorts, so AQE still
  * coalesces/skew-splits them like any shuffle.
  *
  * Semantics (identical to `asofBackward`, differentially pinned by
  * AsOfNativeSpec): each left row receives the value columns of the
  * LAST right row (in (keys, rightTime) order) with rightTime ≤
  * leftTime in the same key group; no match → nulls. Like the window
  * formulation — and unlike SQL equality joins — null keys form a
  * group and match each other; null right times sort first and are
  * visible to every left row of the group.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {
  // Right-side values are nullable in the output (a left row may precede
  // every right row of its group); exprIds are kept so parent plans
  // resolve against this node like against a Project.
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]. Injected per-session via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftSession) and
  * idempotently through `experimental.extraStrategies` for foreign
  * sessions (a query may run in the driver's own session).
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.output, n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.rightValues, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    output: Seq[Attribute],
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  // Declared, not hand-built: EnsureRequirements adds the hash exchanges
  // (co-partitioned on the keys) and the in-partition sorts, and AQE
  // treats them like any other join shuffle.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  // Right-side sort carries the (orderable) value columns after the
  // time: among right rows tied on (keys, rightTime) the merge takes the
  // LAST in stream order, so this pins the tie to "largest value tuple
  // wins" — the same order the window formulation declares on its value
  // struct. Without it the tie falls to partition-internal order.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder(a, Ascending)),
    ((rightKeys :+ rightTime) ++
      rightValues.filter(a => RowOrdering.isOrderable(a.dataType)))
      .map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    // Locals only — the closure must not capture the plan node.
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lKT = lKeys :+ leftTime
    val rKT = rKeys :+ rightTime
    val keyTypes = lKeys.map(_.dataType)
    val ktTypes = lKT.map(_.dataType)
    val valueExprs = rightValues
    val numValues = rightValues.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) lexicographic ≤ is exactly the as-of advance
      // condition: rightKey < leftKey, or equal key and rightTime ≤
      // leftTime.
      val ktOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(ktTypes)
      val kOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKtProj = UnsafeProjection.create(lKT, lOut)
      val rKtProj = UnsafeProjection.create(rKT, rOut)
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val rValProj = UnsafeProjection.create(valueExprs, rOut)
      // JoinedRow(left, values) matches `output` positionally; the final
      // identity projection materializes it as one UnsafeRow for parents.
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val nullValues = new GenericInternalRow(numValues)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        private var matchedValues: InternalRow = null
        private var matchedKey: InternalRow = null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lKtProj(l)
          // Consume right rows up to (leftKey, leftTime); the last one in
          // the left row's key group becomes its match. Right rows of
          // earlier keys advance the stream without touching the match.
          var continue = rBuf.hasNext
          while (continue) {
            val r = rBuf.head
            if (ktOrd.compare(rKtProj(r), lkt) <= 0) {
              val rk = rKeyProj(r)
              if (kOrd.compare(rk, lKeyProj(l)) == 0) {
                matchedValues = rValProj(r).copy()
                matchedKey = rk.copy()
              }
              rBuf.next()
              continue = rBuf.hasNext
            } else continue = false
          }
          // A match carried from a previous key group is stale.
          val values =
            if (matchedKey != null && kOrd.compare(matchedKey, lKeyProj(l)) == 0)
              matchedValues
            else nullValues
          resultProj(joined(l, values))
        }
      }
    }
  }

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Idempotently make the strategy available in `spark` — covers
    * foreign sessions (the driver harness) where the builder-time
    * `SparkSessionExtensions` injection didn't run. Checks the live
    * planner's full strategy list (which includes both extension-
    * injected and experimental strategies), so graft-built sessions
    * don't get a redundant second registration via the experimental
    * path.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.planner.strategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy

  /** Backward as-of join on the native plan node — same contract as
    * [[graft.operators.AsOfJoin.asofBackward]].
    */
  def asofBackwardNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // Fresh exprIds + unclashing names for the right side: as-of is
    // routinely a self-join (events vs filtered events), and duplicate
    // attribute ids across the two children would trip the analyzer's
    // deduplication.
    val rAliased = right.select(right.columns.map(c => col(c).as(s"__r_$c")).toIndexedSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = rAliased.queryExecution.analyzed
    def la(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"left side has no column '$n'"))
    def ra(n: String): Attribute = rp.output.find(_.name == s"__r_$n").getOrElse(
      throw new IllegalArgumentException(s"right side has no column '$n'"))
    val node = AsOfJoinNode(lp, rp,
      keys.map(la), keys.map(ra), la(leftTime), ra(rightTime), valueCols.map(ra))
    val joined = org.apache.spark.sql.classic.GraftPlanBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
    joined.select(left.columns.map(col) ++
      valueCols.map(c => col(s"__r_$c").as(c)): _*)
  }
}
