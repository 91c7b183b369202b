package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals for the graft library's
  * custom Catalyst expressions (the supported extension idiom for
  * libraries shipping native expressions: live inside the sql package
  * namespace, as Delta/Sedona/etc. do).
  */
object SqlBridge {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its analyzed Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on an ALREADY-RUNNING session (session
    * extensions only apply at build time). Same builders as
    * [[graft.spark.GraftExtensions]]. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Run an assembled logical plan as a DataFrame — the hook a SQL text
    * surface needs after substituting its own relations into a parsed
    * plan (`Dataset.ofRows` is `private[sql]`; same bridge idiom as
    * above). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
