package graft.functions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE narrow expression — no
  * explode, no shuffle. The aggregation formulation
  * ([[graft.operators.Dedup.minhashSignatures]]) shuffles every
  * (id, shingle) row to group them back per document; at 100 TB the
  * shingle explosion is ~100× the corpus. This expression computes the
  * identical signature (word 3-gram shingles; hash i = lexicographic
  * min over shingles of the 8-hex-char slice `i%4` of
  * `md5((i/4) + "|" + shingle)`) in a single pass per document:
  * signature generation becomes map-side only, and only the 8 slices
  * per document ever move.
  *
  * Codegen calls the static [[MinHashSignature.compute]] (the digest
  * dominates; the call keeps the surrounding stage in whole-stage
  * codegen). Documents with fewer than k tokens yield an empty array —
  * the aggregation form drops them, so callers filter `size > 0`.
  */
case class MinHashSignature(child: Expression, numHashes: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], numHashes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.functions.MinHashSignature.compute(
         |  $t, $numHashes, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** Identical math to the Dedup.shingles + minhashSignatures pair:
    * split on single spaces (all tokens kept), 3-gram shingles joined by
    * one space, per-hash lexicographic min of the md5 hex slice. Shingle
    * duplicates don't affect a min, so no dedup pass is needed. */
  def compute(text: UTF8String, numHashes: Int, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val nSeeds = (numHashes + 3) / 4
    val mins = new Array[String](numHashes)
    var s = 0
    val sb = new java.lang.StringBuilder
    while (s <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(s + j))
        j += 1
      }
      val shingle = sb.toString
      var seed = 0
      while (seed < nSeeds) {
        val hex = DigestUtils.md5Hex(seed.toString + "|" + shingle)
        var slice = 0
        while (slice < 4 && seed * 4 + slice < numHashes) {
          val i = seed * 4 + slice
          val v = hex.substring(slice * 8, slice * 8 + 8)
          if (mins(i) == null || v.compareTo(mins(i)) < 0) mins(i) = v
          slice += 1
        }
        seed += 1
      }
      s += 1
    }
    new GenericArrayData(
      mins.map(m => UTF8String.fromString(m).asInstanceOf[Any]))
  }

  /** Column API. */
  def minhashSig(text: Column, numHashes: Int = 8, k: Int = 3): Column =
    SqlBridge.column(
      MinHashSignature(SqlBridge.expression(text), numHashes, k))
}
