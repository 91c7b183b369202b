package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Net adjacent-pair count delta between two token strings, as ONE
  * narrow expression: `pair_delta(before, after)` returns
  * `array<struct<pair: string, n: bigint>>` where each entry is a pair
  * whose occurrence count changed (`after` counted +1, `before` -1;
  * zero-net pairs are dropped inside the expression, so an unchanged
  * document emits nothing).
  *
  * This exists for the incremental BPE trainer (t24): the per-round
  * delta over affected documents is semantically
  * `pairs(after) EXCEPT-COUNT pairs(before)`, but the declarative form
  * (two zip_with/slice/lambda trees + union + pre-aggregation) costs
  * more in per-round Catalyst planning than the round's actual work —
  * an 8-iteration driver loop re-plans 8 times. One expression node
  * keeps the round's plan tiny and the whole scan inside whole-stage
  * codegen, and doc-local netting shrinks the shuffle: only pairs whose
  * count actually changed leave the map side.
  *
  * Tokenization matches `split(trim(t), ' ')` exactly (single-space
  * split, empty tokens kept) so the DuckDB oracle's full recount stays
  * bit-identical.
  */
case class PairDelta(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pair", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "pair_delta"

  override def nullSafeEval(before: Any, after: Any): Any =
    PairDelta.compute(
      before.asInstanceOf[UTF8String], after.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, a) => {
      s"${ev.value} = graft.functions.PairDelta.compute($b, $a);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PairDelta {

  /** `pair_delta(before, after)` as a Column. */
  def pairDelta(before: Column, after: Column): Column =
    SqlBridge.column(
      PairDelta(SqlBridge.expression(before), SqlBridge.expression(after)))

  private def accumulate(m: java.util.HashMap[String, Long],
      t: UTF8String, w: Long): Unit = {
    // trim() matches SQL trim (0x20 only); split on single spaces with
    // empties kept matches split(t, ' ') in both engines
    val toks = t.trim().toString.split(" ", -1)
    var i = 0
    while (i < toks.length - 1) {
      val p = toks(i) + " " + toks(i + 1)
      m.merge(p, w, (x, y) => x + y)
      i += 1
    }
  }

  def compute(before: UTF8String, after: UTF8String): ArrayData = {
    val m = new java.util.HashMap[String, Long]()
    accumulate(m, after, 1L)
    accumulate(m, before, -1L)
    val out = new java.util.ArrayList[Any](m.size)
    m.forEach { (pair, n) =>
      if (n != 0L) out.add(new GenericInternalRow(
        Array[Any](UTF8String.fromString(pair), n)): InternalRow)
    }
    new GenericArrayData(out.toArray)
  }
}
