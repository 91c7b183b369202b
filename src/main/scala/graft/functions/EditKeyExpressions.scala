package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-deletion neighborhood keys for bounded edit-distance joins
  * ([[graft.operators.EditJoin]]): the string itself plus every
  * single-code-point deletion, de-duplicated (a run of equal characters
  * contributes ONE deletion key). The declarative
  * `transform(sequence(...), i -> concat(substr...))` form evaluates an
  * interpreted lambda per key — ~µs-scale per element over what is the
  * hot explode of the fuzzy joins — so this is the same (b)-tier custom
  * codegen treatment DotProductFloat gives the similarity scans.
  * Deletions are code-point based, matching UTF8String.substring and
  * the code-point Levenshtein Spark computes. */
object Del1KeysRuntime {
  def keys(s: UTF8String): ArrayData = {
    val n = s.numChars()
    val set = new java.util.LinkedHashSet[UTF8String]()
    set.add(s)
    var i = 0
    while (i < n) {
      set.add(UTF8String.concat(s.substring(0, i), s.substring(i + 1, n)))
      i += 1
    }
    new GenericArrayData(set.toArray(new Array[AnyRef](set.size())))
  }
}

case class Del1Keys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "del1_keys"

  override def nullSafeEval(v: Any): Any =
    Del1KeysRuntime.keys(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Del1KeysRuntime.keys($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EditKeyFunctions {
  def del1Keys(name: Column): Column =
    SqlBridge.column(Del1Keys(SqlBridge.expression(name)))
}
