package graft

import graft.operators.BudgetCut
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins the histogram-cut edges the fixture query can't force: zero and
  * over-total budgets, exact exhaustion at a bucket seam, the boundary
  * bucket's (score desc, id) split, and tie determinism. */
class BudgetCutSpec extends AnyFunSuite with SharedSpark {

  private def cut(rows: Seq[(Long, Double, Long)], budget: Long): Seq[Long] = {
    import spark.implicits._
    BudgetCut.qualityBudgetCut(rows.toDF("id", "score", "tok"),
        "id", "score", "tok", budget, buckets = 10)
      .orderBy(col("id")).select(col("id")).as[Long].collect.toSeq
  }

  private val base = Seq( // buckets (of 10): 9, 8, 7, 6
    (1L, 0.95, 10L), (2L, 0.85, 10L), (3L, 0.75, 10L), (4L, 0.65, 10L))

  test("zero budget keeps nothing; budget ≥ total keeps everything") {
    assert(cut(base, 0L) === Seq.empty)
    assert(cut(base, 40L) === Seq(1L, 2L, 3L, 4L))
    assert(cut(base, 1000L) === Seq(1L, 2L, 3L, 4L))
  }

  test("exact exhaustion at a bucket seam excludes the next bucket entirely") {
    assert(cut(base, 20L) === Seq(1L, 2L))
    // 5 tokens left at bucket 7 but its doc needs 10 — excluded too
    assert(cut(base, 25L) === Seq(1L, 2L))
  }

  test("boundary bucket splits by (score desc, id) against the residual budget") {
    val rows = base :+ (5L, 0.78, 10L) // bucket 7, higher score than id 3
    assert(cut(rows, 30L) === Seq(1L, 2L, 5L)) // residual 10 → id 5 only
    assert(cut(rows, 40L) === Seq(1L, 2L, 3L, 5L)) // residual 20 → both
  }

  test("same-score boundary ties break by id ascending") {
    val rows = Seq((7L, 0.75, 10L), (6L, 0.75, 10L), (8L, 0.75, 10L))
    assert(cut(rows, 20L) === Seq(6L, 7L))
  }

  test("null scores are excluded, not crashed on") {
    import spark.implicits._
    val rows = Seq((1L, Some(0.9), 10L), (2L, None, 10L), (3L, Some(0.5), 10L))
    val kept = BudgetCut.qualityBudgetCut(rows.toDF("id", "score", "tok"),
        "id", "score", "tok", budgetTokens = 30L, buckets = 10)
      .orderBy(col("id")).select(col("id")).as[Long].collect.toSeq
    assert(kept === Seq(1L, 3L))
  }

  test("zero-token bucket on the exact-exhaustion seam is kept (free bucket)") {
    // budget 20 exhausts exactly at bucket 8; bucket 7 holds only a
    // 0-token doc — the full-bucket rule (prefix + t <= budget) keeps it
    val rows = Seq((1L, 0.95, 10L), (2L, 0.85, 10L), (9L, 0.75, 0L), (4L, 0.65, 10L))
    assert(cut(rows, 20L) === Seq(1L, 2L, 9L))
    // a non-zero bucket on the same seam stays excluded
    assert(cut(base, 20L) === Seq(1L, 2L))
  }

  test("constant score column (degenerate single-bucket corpus) cuts exactly, distributed") {
    // saturated classifier: every doc scores 0.75 → the WHOLE corpus is
    // the boundary bucket → the share guard must route through the
    // two-pass running sum, and the keep set is still the exact
    // (score desc, id asc) prefix
    val rows = (1L to 200L).map(id => (id, 0.75, 10L))
    assert(cut(rows, 170L) === (1L to 17L))
    assert(cut(rows, 175L) === (1L to 17L)) // partial doc never kept
    assert(cut(rows, 0L) === Seq.empty)
    assert(cut(rows, 2000L) === (1L to 200L))
  }

  test("withRunningSum equals the single-partition window running sum") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.sum
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(id => (id, rnd.nextInt(100).toDouble, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "score", "tok")
    val order = Seq(col("score").desc, col("id"))
    val dist = graft.operators.GlobalRank.withRunningSum(df, order, "tok", "run")
      .select("id", "run").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("run", sum(col("tok")).over(w))
      .select("id", "run").as[(Long, Long)].collect().toMap
    assert(dist === naive)
  }

  test("score 1.0 and clamped out-of-range scores land in stable buckets") {
    val rows = Seq((1L, 1.0, 10L), (2L, 1.7, 10L), (3L, -0.2, 10L))
    // 1.0 and the clamped 1.7 share bucket 10; -0.2 clamps to bucket 0
    assert(cut(rows, 20L) === Seq(1L, 2L))
    assert(cut(rows, 30L) === Seq(1L, 2L, 3L))
  }
}
