package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Argmin-centroid assignment for [[graft.operators.KMeans]] — the k
  * centroids ride along as a codegen reference object (k·dim floats, a
  * model not data payload), so the per-row work is one tight
  * generated-code loop: k × dim fused subtract-square-accumulate, no
  * crossJoin blowup, no interpreted higher-order-function lambda. Ties
  * break to the lower centroid index; accumulation order is the fixed
  * dimension order, so assignment is bit-deterministic under any
  * partitioning. */
object NearestCentroidRuntime {
  /** index of the nearest centroid by squared L2 distance. */
  def bestIndex(v: ArrayData, cents: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0; var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cent(i).toDouble
        d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** v − cents(c): the coarse-quantizer residual (IVF-PQ's encode
    * input). Returned as a primitive float array — no boxing. */
  def residual(v: ArrayData, c: Int, cents: Array[Array[Float]]): ArrayData = {
    val cent = cents(c)
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = v.getFloat(i) - (if (i < cent.length) cent(i) else 0.0f)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** squared L2 distance to the nearest centroid. */
  def bestDist(v: ArrayData, cents: Array[Array[Float]]): Double = {
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0; var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cent(i).toDouble
        d += diff * diff; i += 1
      }
      if (d < bestD) bestD = d
      c += 1
    }
    bestD
  }
}

case class NearestCentroid(child: Expression, cents: Array[Array[Float]],
    returnDist: Boolean) extends UnaryExpression {

  require(cents.nonEmpty, "centroid set must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = if (returnDist) DoubleType else IntegerType
  override def prettyName: String =
    if (returnDist) "nearest_centroid_dist" else "nearest_centroid"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (returnDist) NearestCentroidRuntime.bestDist(a, cents)
    else NearestCentroidRuntime.bestIndex(a, cents)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "float[][]")
    val fn = if (returnDist) "bestDist" else "bestIndex"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCentroidRuntime.$fn($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** vec − cents(clusterId): the coarse residual IVF-PQ quantizes
  * (Jégou et al. 2011 §IV: encoding the residual instead of the raw
  * vector shrinks the energy the product quantizer must capture, which
  * is where IVFADC's accuracy comes from). Codegen'd; the centroid
  * table rides as a reference object like [[NearestCentroid]]'s. */
case class CentroidResidual(left: Expression, right: Expression,
    cents: Array[Array[Float]]) extends BinaryExpression {

  require(cents.nonEmpty, "centroid set must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "centroid_residual"

  override def nullSafeEval(v: Any, c: Any): Any =
    NearestCentroidRuntime.residual(
      v.asInstanceOf[ArrayData], c.asInstanceOf[Int], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "float[][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.NearestCentroidRuntime.residual($v, $c, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidFunctions {
  def nearestCentroid(vec: Column, cents: Array[Array[Float]]): Column =
    SqlBridge.column(
      NearestCentroid(SqlBridge.expression(vec), cents, returnDist = false))

  def nearestSqDist(vec: Column, cents: Array[Array[Float]]): Column =
    SqlBridge.column(
      NearestCentroid(SqlBridge.expression(vec), cents, returnDist = true))

  def centroidResidual(vec: Column, clusterId: Column,
      cents: Array[Array[Float]]): Column =
    SqlBridge.column(CentroidResidual(
      SqlBridge.expression(vec), SqlBridge.expression(clusterId), cents))
}
