package graft.plans

import graft.functions.Md5Hash
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Bloom-filter membership probe
  * ([[graft.operators.Sketches.bloomMightContain]]): k
  * Kirsch–Mitzenmacher positions over the densified word array, fused
  * into whole-stage codegen.
  *
  * The (b) tier of the custom-operator ladder (SURVEY §4.3), replacing a
  * Scala UDF: the UDF boxed every input string through the
  * Scala-function bridge and fenced off the codegen stage; this
  * expression keeps the probe inside the generated loop. The word array
  * rides a `Broadcast` handle — the expression serializes as the small
  * broadcast id per task while executors fetch the (up to 136 MB)
  * words once, which is exactly the lifetime the cluster needs at
  * probe-side scale.
  *
  * Null semantics match the UDF it replaces: null probes are definite
  * non-members (false), not null.
  */
case class BloomProbeExpr(child: Expression, words: Broadcast[Array[Long]],
    mBits: Long, k: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else BloomProbeExpr.probe(v.asInstanceOf[UTF8String].toString, words.value, mBits, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomWords", words,
      classOf[Broadcast[Array[Long]]].getName)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = false;
      if (!${c.isNull}) {
        ${ev.value} = graft.plans.BloomProbeExpr.probe(
          ${c.value}.toString(), (long[]) $bcRef.value(), ${mBits}L, $k);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}

object BloomProbeExpr {
  /** Shared probe kernel (interpreted eval + generated code both call
    * it): h1/h2 are the MD5 windows [[graft.functions.Md5Hash]] shares
    * with the SQL oracle, so probe and build can never disagree. */
  def probe(s: String, w: Array[Long], mBits: Long, k: Int): Boolean = {
    val hs = Md5Hash.h1h2(s)
    val h1 = hs._1
    val h2 = hs._2
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % mBits
      if ((w((pos / 63).toInt) & (1L << (pos % 63).toInt)) == 0L) return false
      i += 1
    }
    true
  }
}
