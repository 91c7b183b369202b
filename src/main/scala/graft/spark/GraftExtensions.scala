package graft.spark

import graft.functions.DotProductFloat
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration (the SURVEY §7.3 (c)-tier mechanism):
  * makes the library's native Catalyst expressions available to pure-SQL
  * users. Activate at session build time with
  * `spark.sql.extensions=graft.spark.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`); for an already-running
  * session, `SqlBridge.registerFunction` installs the same builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotProductFloat)
}

object GraftExtensions {
  /** `dot_product_float(array<float>, array<float>) -> double` — the
    * codegen'd [[DotProductFloat]] as a SQL function. */
  val dotProductFloat
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName,
        "dot_product_float"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_product_float expects 2 arguments, got ${args.length}")
        DotProductFloat(args.head, args(1))
      })
}
