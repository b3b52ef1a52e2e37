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

  def cosine(a: Column, b: Column): Column = {
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
    * derived deterministically from `xxhash64(seed, dim)`; the bucket id
    * packs the sign bits. Vectors in the same bucket are candidate
    * near-neighbors — the scale path that avoids the O(n²) cross join.
    */
  def srpBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    // Deterministic pseudo-random hyperplane component h(bit, i) in [-1,1):
    // xxhash64 of (seed, bit, i) scaled. Computed as a literal-free
    // expression tree so Catalyst constant-folds per (bit, i).
    val bits = (0 until nBits).map { b =>
      val proj = (0 until dim).map { i =>
        val h = xxhash64(lit(seed), lit(b), lit(i))
        val coeff = (h % 1000001L).cast("double") / 1000000.0d
        element_at(vec, i + 1) * coeff
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
