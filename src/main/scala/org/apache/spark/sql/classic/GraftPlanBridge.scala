package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private `Dataset.ofRows`: the supported way to
  * turn a custom `LogicalPlan` node (graft.plans.AsOfJoinNode) into a
  * DataFrame. Catalyst extension points let us inject the STRATEGY
  * publicly, but constructing a DataFrame from a raw logical plan still
  * goes through this non-public constructor — the same bridge pattern
  * every plan-extension library uses.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[org.apache.spark.sql.Row] =
    Dataset.ofRows(spark, plan)

  /** Column over a raw Catalyst expression — needed for expressions that
    * carry non-SQL-expressible state (e.g. a Broadcast handle), which
    * the public FunctionRegistry route cannot construct. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  /** Inverse of [[column]] — the raw Catalyst expression behind a Column. */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
