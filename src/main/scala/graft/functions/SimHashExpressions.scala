package graft.functions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of the token multiset as ONE narrow expression — the
  * companion to [[MinHashSignature]]: signature generation with no
  * token explode and no shuffle. Identical math to
  * [[graft.operators.Dedup.simhash]]'s aggregation form (each token's
  * md5 split into 4×16-bit chunks, per-bit ±1 sign sums, bit set when
  * the sum is positive) — asserted equal in DedupSimilaritySpec.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SimHash64.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  def compute(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val sums = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val hex = DigestUtils.md5Hex(toks(ti))
      var c = 0
      while (c < 4) {
        val v = Integer.parseInt(hex.substring(4 * c, 4 * c + 4), 16)
        var l = 0
        while (l < 16) {
          val j = c * 16 + l
          if (((v >> l) & 1) == 1) sums(j) += 1 else sums(j) -= 1
          l += 1
        }
        c += 1
      }
      ti += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Column API. */
  def simhash64(text: Column): Column =
    SqlBridge.column(SimHash64(SqlBridge.expression(text)))
}
