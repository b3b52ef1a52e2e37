package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / point-in-time / interval joins (SURVEY §2.4 J8–J12) — the
  * reference's report→daily expansion pattern
  * (/root/reference/tasks/jqdata/stock/finance_report/__init__.py:456-565,
  * /root/reference/tasks/merge/stock.py:255-361).
  *
  * Spark has no built-in as-of join. A naive `t_r <= t_l` non-equi join
  * explodes to O(|L|·|R|) per key before the dedup window, which dies at
  * scale. The scalable formulation used here is union-and-carry: tag both
  * sides, sort each key group once by time, and carry the latest right
  * values forward with `last(..., ignoreNulls)` — one shuffle on the key,
  * O((|L|+|R|) log) per key, no intermediate blowup, and AQE-friendly.
  */
object AsOfJoin {

  /** Backward as-of join: each left row receives `valueCols` from the
    * latest right row whose `rightTime` ≤ the left row's `leftTime`,
    * matching on `keys`. Right columns keep their names (callers alias
    * beforehand on collision).
    *
    * All value columns are carried together in ONE struct, so every left
    * row sees a row-consistent snapshot of the latest right row — carrying
    * each column with its own `last(ignoreNulls)` would stitch values from
    * different right rows whenever the latest right row holds a null in
    * one of them, diverging from row-level as-of semantics.
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    val vType = org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c)))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(vType))
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(keys.map(col) ++
        left.columns.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__t"), col("__side"), struct(valueCols.map(col): _*).as("__v")): _*)
    // At equal timestamps the right (state) row sorts first, so a report
    // published on day T is visible to day T itself — the reference's
    // `pub_date <= trade_date` inclusive semantics. The struct of a right
    // row is never null (the row exists), so last(ignoreNulls) lands on
    // the latest right row even when its individual fields are null.
    // Right rows sharing (keys, rightTime) are pinned by the ORDERABLE
    // SUBSET of the value columns, ascending (largest orderable tuple
    // wins) — without this the tie is decided by partition-internal
    // sort order, making results (and oracle parity) run-dependent on
    // duplicate-timestamp state tables. Filtering per COLUMN (not
    // all-or-nothing on the whole struct) matches the native kernel's
    // requiredChildOrdering exactly (plans/AsOfJoinPlan.scala
    // `rightValues.filter(isOrderable)`), so both kernels order ties
    // identically even on mixed value sets (e.g. a map column next to
    // an int). When NO value column is orderable the residual tie is
    // partition-order-dependent in both kernels alike.
    val orderableVals = valueCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType))
    val vTieBreak =
      if (orderableVals.isEmpty) Seq.empty
      else Seq(struct(orderableVals.map(c => col("__v").getField(c)): _*).asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col("__t").asc, col("__side").asc) ++ vTieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lTagged.unionByName(rTagged.select(lTagged.columns.map(col): _*))
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col("__v").getField(c).as(c)): _*)
  }

  /** [[asofBackward]] with a staleness bound — pandas `merge_asof`'s
    * `tolerance`: a match older than `maxStaleness` (an INTERVAL
    * expression for time columns) is treated as no match and the value
    * columns come back null. The matched right time rides the same
    * carried struct, so the bound is applied to the row-consistent
    * snapshot, not per column; the plan shape (one keyed shuffle +
    * window) is unchanged — the bound is a post-projection.
    */
  def asofBackwardWithin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      maxStaleness: org.apache.spark.sql.Column): DataFrame = {
    val joined = asofBackward(left,
      right.withColumn("__rt", col(rightTime)), keys,
      leftTime, rightTime, valueCols :+ "__rt")
    val fresh = col("__rt").isNotNull &&
      col(leftTime) <= col("__rt") + maxStaleness
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }.drop("__rt")
  }

  /** Interval membership join (J10): flag left rows whose `dateCol` falls
    * in any [startCol, endCol] interval of the same key — suspension
    * ranges (/root/reference/tasks/merge/tushare.py:190-221). Intervals
    * per key are few, so the interval side broadcasts.
    */
  def flagInIntervals(
      left: DataFrame, intervals: DataFrame, keys: Seq[String],
      dateCol: String, startCol: String, endCol: String, flagName: String): DataFrame = {
    val iv = intervals.select(keys.map(col) :+ col(startCol) :+ col(endCol): _*)
    val cond = keys.map(k => left(k) === iv(k)).reduce(_ && _) &&
      left(dateCol) >= iv(startCol) && left(dateCol) <= iv(endCol)
    val joined = left.join(broadcast(iv), cond, "left_outer")
      .withColumn(flagName, when(iv(startCol).isNotNull, 1).otherwise(0))
      .drop(iv(startCol)).drop(iv(endCol))
    keys.foldLeft(joined)((d, k) => d.drop(iv(k)))
      .dropDuplicates(left.columns.toIndexedSeq :+ flagName) // overlapping intervals must not dup rows
  }

  /** J12 — expand interval rows to one row per calendar date in
    * [startCol, endCol): the reference's row-loop
    * (finance_report/__init__.py:525-560) done set-based against the
    * trade calendar.
    */
  def expandToCalendar(
      intervals: DataFrame, calendar: DataFrame, calDateCol: String,
      startCol: String, endCol: String): DataFrame = {
    val cal = broadcast(calendar.select(col(calDateCol)))
    intervals.join(cal,
      cal(calDateCol) >= intervals(startCol) && cal(calDateCol) < intervals(endCol),
      "inner")
  }
}
