package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 history build: fold a keyed change stream into validity
  * intervals — the warehouse shape behind the reference's
  * keep-the-history vendor merges (each upsert keeps only the latest
  * row; this operator is the other policy, where every VALUE CHANGE
  * opens a new interval).
  *
  * Change detection is `lag` over the per-key event order with an
  * explicit tie-break column, so the fold is deterministic at any
  * partitioning; islands get run ids from a running change-count;
  * `valid_to` is the NEXT island's start (half-open SCD2 convention),
  * null on the open current row. One shuffle on the entity key — every
  * window and the island aggregation share that partitioning.
  */
object ScdHistory {

  /** Returns (key, run_id, status, valid_from, valid_to, is_current,
    * n_rows), keyed by `keyCol`, ordered within key by
    * (orderCol, tieCol).
    */
  def fold(rows: DataFrame, keyCol: Column, orderCol: Column, tieCol: Column,
      statusCol: Column): DataFrame = {
    val base = rows.select(keyCol.as("key"), orderCol.as("__ord"),
      tieCol.as("__tie"), statusCol.as("status"))
    val w = Window.partitionBy(col("key")).orderBy(col("__ord"), col("__tie"))
    // Null-safe change detection: `lag =!= status` is NULL (no change
    // counted) on any transition into or out of a null status, which
    // would merge distinct-status rows under one run_id and then split
    // them again in the groupBy — two intervals sharing a run_id. A
    // null-safe compare treats null as a status value in its own right
    // (null → null is NOT a change); the explicit first-row test is
    // needed because `lag IS NULL` cannot distinguish "no previous row"
    // from "previous status was null".
    val runs = base
      .withColumn("__rn", row_number().over(w))
      .withColumn("chg",
        when(col("__rn") === 1 ||
          !(lag(col("status"), 1).over(w) <=> col("status")), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("key"), col("run_id"), col("status"))
      .agg(min(col("__ord")).as("valid_from"), count(lit(1)).as("n_rows"))
    val wk = Window.partitionBy(col("key")).orderBy(col("run_id"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("key"), col("run_id"), col("status"),
        col("valid_from"), col("valid_to"), col("is_current"), col("n_rows"))
  }
}
