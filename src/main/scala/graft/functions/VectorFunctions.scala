package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, written with
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so similarity scans stay inside whole-stage codegen.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  /** Cosine similarity — native codegen'd expression
    * ([[graft.plans.CosineSimilarity]]): one fused loop instead of five
    * interpreted higher-order passes. Requires
    * `CosineSimilarity.register(spark)` (done by GraftSession/Verify/
    * Bench entry points).
    */
  def cosine(a: Column, b: Column): Column =
    call_function(graft.plans.CosineSimilarity.name, a, b)

  /** Higher-order-function formulation (reference implementation for
    * parity tests; interpreted). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(0.0)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v))

  /** Unit-normalized copy of the vector (zero vectors pass through). */
  def normalized(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(a, v => v / n)).otherwise(a)
  }

  /** Sign-random-projection bucket (LSH for cosine): `nBits` hyperplanes
    * drawn deterministically from the seed; the bucket id packs the sign
    * bits. Vectors in the same bucket are candidate near-neighbors — the
    * scale path that avoids the O(n²) cross join.
    *
    * Hyperplane components are Rademacher ±1 (a standard SRP variant,
    * Achlioptas-style) derived from `Md5Hash.h1("srp:seed:bit:dim")`
    * parity — deterministic AND recomputable by the DuckDB oracle, unlike
    * a seeded Gaussian PRNG. The matrix is materialized once on the
    * driver and ships in the UDF closure; the per-row work is one fused
    * dim×nBits loop (the expression-tree formulation was a 384-node
    * interpreted plan).
    */
  def srpBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val planes: Array[Array[Double]] =
      Array.tabulate(nBits, dim)((b, i) =>
        if (Md5Hash.h1(s"srp:$seed:$b:$i") % 2 == 0) 1.0 else -1.0)
    val bucketUdf = udf { v: Seq[Double] =>
      var out = 0L
      var b = 0
      while (b < nBits) {
        val p = planes(b)
        var acc = 0.0
        var i = 0
        val n = math.min(dim, v.length)
        while (i < n) { acc += v(i) * p(i); i += 1 }
        if (acc >= 0) out |= (1L << b)
        b += 1
      }
      out
    }
    bucketUdf(vec)
  }
}
