package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd topic→language lookup — the inner loop of
  * [[Scores.langDistribution]] (23 substring probes per topic,
  * reference semantics: every (topic, dict-entry) match appends one
  * language name, duplicates included, dict order preserved).
  *
  * The HOF formulation (`flatten(transform(filter(dict, contains)))`)
  * is CodegenFallback: every row pays interpreted-lambda overhead × 23
  * entries × topics, which made the silver pipeline the slowest gate
  * query. This expression runs the same loop as generated Java over two
  * constant UTF8String arrays. Null topic elements match nothing (the
  * HOF's `contains(null, k) -> null -> filtered` behavior).
  */
case class TopicLangMatches(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "topic_lang_matches"

  override def nullSafeEval(input: Any): Any = {
    val topics = input.asInstanceOf[ArrayData]
    val keys = TopicLangMatches.keys
    val values = TopicLangMatches.values
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < topics.numElements()) {
      if (!topics.isNullAt(i)) {
        val t = topics.getUTF8String(i).toLowerCase
        var j = 0
        while (j < keys.length) {
          if (t.contains(keys(j))) out.add(values(j))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val keys = ctx.addReferenceObj("tlKeys", TopicLangMatches.keys,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val values = ctx.addReferenceObj("tlValues", TopicLangMatches.values,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      s"""
         |java.util.ArrayList<Object> $out = new java.util.ArrayList<Object>();
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $t =
         |      $arr.getUTF8String($i).toLowerCase();
         |    for (int $j = 0; $j < $keys.length; $j++) {
         |      if ($t.contains($keys[$j])) $out.add($values[$j]);
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopicLangMatches {
  private[functions] val keys: Array[UTF8String] =
    Scores.programmingLanguages.map(e => UTF8String.fromString(e._1)).toArray
  private[functions] val values: Array[UTF8String] =
    Scores.programmingLanguages.map(e => UTF8String.fromString(e._2)).toArray

  /** Column API: topic array → matched language names (dups included). */
  def topicLangs(topics: Column): Column =
    SqlBridge.column(TopicLangMatches(SqlBridge.expression(topics)))
}
