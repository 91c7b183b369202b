package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Intra-document n-gram repetition statistics as ONE narrow codegen'd
  * expression — `struct(n_grams, n_distinct, top_n)` per document in a
  * single pass (token split + one hash-map count), replacing the
  * higher-order-function formulation whose interpreted fold
  * (CodegenFallback `aggregate`) dominated t15 at sf0.1. Map-side only:
  * no explode, no shuffle, the per-doc-filter shape that holds at
  * 100 TB. Counting is over the gram multiset, so the result is
  * order-independent and engine-reproducible.
  */
case class NgramRepetition(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = NgramRepetition.schema
  override def prettyName: String = "ngram_repetition"

  override def nullSafeEval(input: Any): Any =
    NgramRepetition.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NgramRepetition.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramRepetition {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))

  /** One pass: count each word n-gram in a hash map; total grams,
    * distinct grams, and the max single count fall out directly.
    * Documents with fewer than n tokens report (0, 0, 0). */
  def compute(text: UTF8String, n: Int): InternalRow = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(s + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      s += 1
    }
    new GenericInternalRow(Array[Any](
      (toks.length - n + 1).toLong, counts.size.toLong, top.toLong))
  }

  /** Column API. */
  def ngramRepetition(text: Column, n: Int = 3): Column =
    SqlBridge.column(NgramRepetition(SqlBridge.expression(text), n))
}
