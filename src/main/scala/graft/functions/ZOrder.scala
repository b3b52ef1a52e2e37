package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data layout — the
  * clustering trick behind Delta/Iceberg `ZORDER BY`: sort by the
  * bit-interleaved key and every written file covers a small RECTANGLE
  * of the (a, b) space instead of a thin stripe, so parquet min/max
  * stats prune scans on EITHER dimension. At 100 TB this is the
  * difference between a point lookup touching ~√F of F files and
  * touching all of them on the non-sort dimension.
  *
  * Reference analogue: the year/date range partitioning of the tick
  * table (`tasks/backend/partition.py:15-91`) clusters ONE dimension;
  * z-order is its two-dimensional generalization.
  */
object ZOrder {

  /** `bits`-bit Morton code of two non-negative integer columns: bit i
    * of `a` lands at position 2i+1, bit i of `b` at 2i. Pure column
    * algebra (2·bits unrolled shift/mask terms — codegen'd, no UDF);
    * values must fit in `bits` bits (the caller scales/normalizes
    * wider domains first, e.g. quantile-rank them).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }
}
