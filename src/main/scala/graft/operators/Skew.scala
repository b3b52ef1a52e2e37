package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4.2). AQE's skew-join splitting
  * handles most cases at runtime; explicit salting remains the tool when
  * a single key dominates a shuffle (e.g. one instrument with 10⁹ ticks)
  * or when AQE can't apply (aggregations over few huge groups).
  */
object Skew {

  /** Two-stage salted aggregation: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. `partials` must be re-aggregatable
    * (sum/count/min/max); the salt is deterministic (hash of `saltBy`)
    * so results are reproducible.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBy: Column,
      saltFactor: Int, partials: Seq[(String, Column)],
      finals: Seq[(String, String => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltBy), lit(saltFactor)))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(finals.head._2(finals.head._1).as(finals.head._1),
        finals.tail.map { case (n, f) => f(n).as(n) }: _*)
  }

  /** Salted equi-join for a skewed left side: left rows get a
    * deterministic salt in [0, saltFactor); the (small) right side is
    * replicated once per salt value, so one hot key spreads across
    * `saltFactor` reducers instead of one.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltBy: Column, saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt", pmod(xxhash64(saltBy), lit(saltFactor)))
    val replicatedRight = other.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
