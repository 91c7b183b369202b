package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch binary, key bigint) -> bigint` — probe a
  * count-min sketch built by Spark's own `count_min_sketch` aggregate.
  *
  * Spark ships the BUILD side as a builtin (binary-emitting aggregate,
  * map-side partials, fixed-size merge — the one-pass 100 TB shape for
  * per-key counts) but no SQL-level probe: the estimate API only exists
  * on the JVM `CountMinSketch` object. This expression closes that gap
  * so a heavy-hitter audit (h1) can stay declarative end-to-end: build
  * the sketch once, broadcast the single-row frame, probe per candidate
  * key.
  *
  * The deserialized sketch is memoized per expression instance keyed on
  * the incoming byte array (identity fast path, content equality
  * fallback — row readers hand out fresh copies), so the probe side
  * deserializes once per distinct sketch, not once per row. Probe
  * cardinality is candidate keys (hundreds), not base rows, so the
  * CodegenFallback eval is off every hot path.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // one volatile (bytes, sketch) pair written atomically: a shared plan
  // evaluated from multiple threads in local mode must never observe a
  // torn cache — bytes from one sketch, deserialized object from another
  @transient @volatile
  private var cached: (Array[Byte], CountMinSketch) = _

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    var c = cached
    if (c == null ||
        (!(bytes eq c._1) && !java.util.Arrays.equals(bytes, c._1))) {
      c = (bytes, CountMinSketch.readFrom(bytes))
      cached = c
    }
    c._2.estimateCount(key.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchFunctions {
  /** Column API: `cmsEstimate(sketch, key)`. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    SqlBridge.column(
      CmsEstimate(SqlBridge.expression(sketch), SqlBridge.expression(key)))
}
