package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Bloom-probe expression (graft.plans.BloomProbeExpr) must
  * agree with the Column-algebra build on members, reject clear
  * non-members, and survive CODEGEN_ONLY — the UDF it replaced ran
  * outside whole-stage codegen.
  */
class BloomProbeSpec extends AnyFunSuite with SharedSpark {

  test("probe matches build; codegen-only compiles the generated kernel") {
    import spark.implicits._
    val members = (1 to 500).map(i => s"member_$i")
    val filter = Sketches.bloomBuild(members.toDF("v"), col("v"), mBits = 1L << 16, k = 5)
    val probes = (members.take(50) ++ (1 to 50).map(i => s"absent_$i"))
      .toDF("v")
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = Sketches.bloomMightContain(filter, probes, col("v"), mBits = 1L << 16, k = 5)
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      // every member must probe true (a Bloom filter has no false negatives)
      assert(members.take(50).forall(got(_)), "false negative — probe/build disagree")
      // at 2^16 bits / 500 members the FP rate is ~1e-7: all absents false
      assert((1 to 50).forall(i => !got(s"absent_$i")), "implausible false positives")
      // null probes are definite non-members, not null
      val nullRow = Sketches.bloomMightContain(filter,
        Seq[Option[String]](None).toDF("v"), col("v"), mBits = 1L << 16, k = 5)
        .select(col("might_contain")).head()
      assert(!nullRow.isNullAt(0) && !nullRow.getBoolean(0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
