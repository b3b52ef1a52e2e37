package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-vendor reconciliation (SURVEY §2.9 F1–F6, §2.10 D9).
  *
  * The reference merges two vendors' tables with a full-outer join and
  * then runs a per-row Python dispatch over column-rule dicts
  * (/root/reference/tasks/merge/__init__.py:21-95, rule tables
  * /root/reference/tasks/merge/stock.py:121-169). Here each rule is a
  * `Column` expression, so the whole per-row loop collapses into one
  * codegen'd projection — and the tolerance *warnings* the reference
  * logged become a queryable side-output DataFrame of conflicts.
  */
object MergeOps {

  /** F1 — null-aware source preference. */
  def preferLeft(l: Column, r: Column): Column = coalesce(l, r)
  def preferRight(l: Column, r: Column): Column = coalesce(r, l)

  /** F2 — mean of the sources present (avg when both, the survivor when
    * one-sided, null when neither). `scale` implements F3's unit-rescaled
    * variants (×10000 share counts, ×100 percents:
    * /root/reference/tasks/merge/future.py:252-253).
    */
  def meanValue(l: Column, r: Column, scale: Double = 1.0): Column = {
    val ls = l * lit(scale)
    val cnt = when(ls.isNotNull, 1).otherwise(0) + when(r.isNotNull, 1).otherwise(0)
    when(cnt === 0, lit(null))
      .otherwise((coalesce(ls, lit(0.0)) + coalesce(r, lit(0.0))) / cnt)
  }

  /** F2's tolerance check as a predicate: both present and relative gap
    * beyond ε (/root/reference/tasks/merge/__init__.py:58-69). */
  def conflictFlag(l: Column, r: Column, tol: Double = 0.01, scale: Double = 1.0): Column = {
    val ls = l * lit(scale)
    ls.isNotNull && r.isNotNull && r =!= 0 && abs(ls - r) / abs(r) >= lit(tol)
  }

  /** F4 — null-safe passthrough with default. */
  def getValue(c: Column, default: Any): Column = coalesce(c, lit(default))

  /** F5 — `max_up_or_down`: reconcile THS's categorical limit-state
    * strings with Wind's numeric flag into {−3,−2,−1,0,1}
    * (/root/reference/tasks/merge/stock.py:187-227): −1 跌停 (limit
    * down), 1 涨停 (limit up), 0 非涨跌停/停牌, −2 both unknown,
    * −3 sources conflict. Implements the *intended* membership test for
    * the neutral states — the reference compares against a tuple, which
    * is always false (SURVEY §7.4 documented divergence).
    */
  def maxUpOrDown(thsVal: Column, windVal: Column): Column = {
    val ths = when(thsVal === "跌停", -1)
      .when(thsVal === "涨停", 1)
      .when(thsVal.isin("非涨跌停", "停牌"), 0)
      .otherwise(lit(null).cast("int"))
    val wind = when(windVal.isin(1, -1, 0), windVal.cast("int"))
      .otherwise(lit(null).cast("int"))
    when(ths.isNull && wind.isNull, -2)
      .when(ths.isNull, wind)
      .when(wind.isNull, ths)
      .when(ths === wind, wind)
      .otherwise(-3)
  }

  /** Provenance marker for a full-outer merge (pandas `indicator=True`,
    * /root/reference/tasks/merge/stock.py:116-120). */
  def provenance(l: Column, r: Column): Column =
    when(l.isNotNull && r.isNotNull, "both")
      .when(l.isNotNull, "left_only")
      .otherwise("right_only")

  /** D9 with the tolerance *warnings* turned into data: returns
    * (merged, conflicts) where `conflicts` is one row per (key, column)
    * whose two sources disagree beyond `tol` — the queryable side-output
    * replacing the reference's log lines
    * (/root/reference/tasks/merge/__init__.py:58-69). Both outputs share
    * the single full-outer join; Spark computes the join once per
    * action, and the conflicts table is tiny (write it to a `_conflicts`
    * table for audit).
    */
  def reconcileWithConflicts(
      left: DataFrame, right: DataFrame,
      keys: Seq[String],
      rules: Seq[(String, (Column, Column) => Column)],
      numericCols: Seq[String],
      tol: Double = 0.01): (DataFrame, DataFrame) = {
    val merged = reconcile(left, right, keys, keys, keys, rules,
      n => left(n), n => right(n))
    val cond = keys.map(k => left(k) <=> right(k)).reduce(_ && _)
    val joined = left.join(right, cond, "inner")
    val conflictStructs = array(numericCols.map { c =>
      struct(lit(c).as("col"), left(c).as("left_value"), right(c).as("right_value"),
        conflictFlag(left(c), right(c), tol).as("isConflict"))
    }: _*)
    val conflicts = joined
      .select(keys.map(k => left(k).as(k)) :+
        explode(filter(conflictStructs, s => s.getField("isConflict"))).as("c"): _*)
      .select(keys.map(col) ++ Seq(col("c.col").as("column"),
        col("c.left_value"), col("c.right_value")): _*)
    (merged, conflicts)
  }

  /** D9 driver — outer-join two vendor tables on `keys` and apply a
    * declarative column→rule map in one `select`. Key columns may be
    * named differently per vendor (`leftKeys`/`rightKeys` are aligned
    * positionally and surfaced under `outKeys`).
    */
  def reconcile(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String], outKeys: Seq[String],
      rules: Seq[(String, (Column, Column) => Column)],
      leftCols: String => Column, rightCols: String => Column): DataFrame = {
    val cond = leftKeys.zip(rightKeys).map { case (lk, rk) => left(lk) <=> right(rk) }
      .reduce(_ && _)
    val joined = left.join(right, cond, "full_outer")
    val keyCols = leftKeys.zip(rightKeys).zip(outKeys).map { case ((lk, rk), ok) =>
      coalesce(left(lk), right(rk)).as(ok)
    }
    val valueCols = rules.map { case (name, rule) => rule(leftCols(name), rightCols(name)).as(name) }
    joined.select(keyCols ++ valueCols: _*)
  }
}
