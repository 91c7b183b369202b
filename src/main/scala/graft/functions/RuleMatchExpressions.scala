package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd classification-rule matcher: index of the FIRST rule (in
  * priority order) with any topic exactly equal to one of its keywords,
  * -1 when none match. Replaces the per-rule `exists(topics, isin)` HOF
  * chain in [[graft.pipeline.RuleClassifier]] — category, subcategory
  * and confidence all branched on up to 10 interpreted HOF evaluations
  * per row; now one generated loop produces the index and the outputs
  * are codegen'd `element_at` lookups. Topics are lowercased before the
  * exact-match probe (the HOF form's `lower(t).isin(kws)`); null topic
  * elements match nothing.
  */
case class RuleMatchIndex(child: Expression,
    keywords: Seq[Seq[String]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "rule_match_index"

  @transient private lazy val kw: Array[Array[UTF8String]] =
    keywords.map(_.map(UTF8String.fromString).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    RuleMatchIndex.firstMatch(input.asInstanceOf[ArrayData], kw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val kwRef = ctx.addReferenceObj("ruleKw", kw,
        "org.apache.spark.unsafe.types.UTF8String[][]")
      s"${ev.value} = graft.functions.RuleMatchIndex.firstMatch($arr, $kwRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RuleMatchIndex {

  def firstMatch(topics: ArrayData, kw: Array[Array[UTF8String]]): Int = {
    var r = 0
    while (r < kw.length) {
      val ks = kw(r)
      var i = 0
      while (i < topics.numElements()) {
        if (!topics.isNullAt(i)) {
          val t = topics.getUTF8String(i).toLowerCase
          var k = 0
          while (k < ks.length) {
            if (t.equals(ks(k))) return r
            k += 1
          }
        }
        i += 1
      }
      r += 1
    }
    -1
  }

  /** Column API. */
  def ruleMatchIndex(topics: Column, keywords: Seq[Seq[String]]): Column =
    SqlBridge.column(RuleMatchIndex(SqlBridge.expression(topics), keywords))
}
