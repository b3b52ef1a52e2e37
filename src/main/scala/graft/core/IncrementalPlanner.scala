package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's signature incremental-load pattern, built once instead
  * of ~30 SQL clones: per-key `max(date)` watermark LEFT JOINed back to
  * the key dimension to plan fetch windows
  * (/root/reference/tasks/tushare/tushare_stock_daily/stock.py:124-150,
  * /root/reference/tasks/jqdata/future/dominant_future.py:79-111,
  * /root/reference/tasks/rqdatac/future.py:162-175).
  *
  * Scale: the watermark aggregate is a map-side-combinable groupBy on the
  * key; the join back to the (small) key dimension broadcasts.
  */
object IncrementalPlanner {

  /** Per-key next-date plan: one row per key with `date_from` =
    * watermark+1, falling back to the key's own start column (e.g. its
    * listing date) when the target has no rows yet.
    */
  def fetchRanges(
      keys: DataFrame,
      existing: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      defaultStart: Column,
      dateTo: Column): DataFrame = {
    val wm = existing
      .groupBy(keyCols.map(col): _*)
      .agg(max(col(dateCol)).as("__wm"))
    keys
      .join(wm, keyCols, "left_outer")
      .withColumn("date_from", coalesce(date_add(col("__wm"), 1), defaultStart))
      .withColumn("date_to", dateTo)
      .drop("__wm")
      .filter(col("date_from") <= col("date_to"))
  }

  /** Global watermark (A2): `max(dateCol)` as a scalar, None on empty. */
  def globalWatermark(existing: DataFrame, dateCol: String): Option[java.sql.Date] = {
    val r = existing.agg(max(col(dateCol)).cast("date")).head()
    if (r.isNullAt(0)) None else Some(r.getDate(0))
  }

  /** Keep only source rows strictly newer than the sink's watermark —
    * the K4 vnpy-append shape
    * (/root/reference/tasks/rqdatac/future.py:374-381).
    */
  def newerThanSink(source: DataFrame, sink: DataFrame, tsCol: String): DataFrame =
    globalWatermark(sink, tsCol) match {
      case Some(d) => source.filter(col(tsCol) > lit(d))
      case None => source
    }

  /** Anti-join new-keys discovery (J4):
    * /root/reference/tasks/merge/code_mapping.py:53-60. */
  def newKeys(candidates: DataFrame, existing: DataFrame, keyCols: Seq[String]): DataFrame =
    candidates.join(existing.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
}
