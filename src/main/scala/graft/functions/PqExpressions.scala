package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd product-quantization reconstruction — the (b)-tier custom
  * treatment ([[DotProductFloat]]'s) for the PQ hot paths: the
  * declarative forms (`flatten(transform(sequence, ...))` for codeword
  * concatenation, `zip_with(coarse, codewords, +)` for coarse+residual)
  * are CodegenFallback higher-order functions evaluated per candidate
  * row of every IVF-PQ search and per corpus row of every index build.
  * Same floats: codeword concatenation copies values; the coarse add is
  * one IEEE float addition per element, exactly what zip_with's `a + b`
  * lambda computed. Out-of-range codes / list ids fail loudly (the
  * AdcLookupSum convention — a stale index read under a narrower model
  * must not score against the wrong codeword). */
object PqReconstructRuntime {

  /** Concatenated codeword lookups: out = books(s)(codes(s)) for each
    * subspace s, flattened. */
  def codewords(codes: ArrayData, books: Array[Array[Array[Float]]],
      subDim: Int): ArrayData = {
    val m = codes.numElements()
    val out = new Array[Float](m * subDim)
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      if (s >= books.length || code < 0 || code >= books(s).length)
        throw new IllegalArgumentException(
          s"pq_codewords: code $code at subspace $s out of range — " +
            "codes encoded under a different PQ model")
      System.arraycopy(books(s)(code), 0, out, s * subDim, subDim)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** coarse(listId) + concatenated codewords, element-wise float add. */
  def reconstruct(listId: Int, codes: ArrayData,
      coarse: Array[Array[Float]], books: Array[Array[Array[Float]]],
      subDim: Int): ArrayData = {
    if (listId < 0 || listId >= coarse.length)
      throw new IllegalArgumentException(
        s"pq_reconstruct: list id $listId out of range [0, ${coarse.length}) — " +
          "index encoded under a different coarse quantizer")
    val c = coarse(listId)
    val m = codes.numElements()
    val out = new Array[Float](m * subDim)
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      if (s >= books.length || code < 0 || code >= books(s).length)
        throw new IllegalArgumentException(
          s"pq_reconstruct: code $code at subspace $s out of range — " +
            "index encoded under a different PQ model")
      val cw = books(s)(code)
      var i = 0
      while (i < subDim) {
        val p = s * subDim + i
        out(p) = (if (p < c.length) c(p) else 0.0f) + cw(i)
        i += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class PqCodewords(child: Expression,
    books: Array[Array[Array[Float]]], subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> codes, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_codewords"

  override def nullSafeEval(codes: Any): Any =
    PqReconstructRuntime.codewords(codes.asInstanceOf[ArrayData], books, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqReconstructRuntime.codewords($c, $ref, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqReconstruct(listId: Expression, codes: Expression,
    coarse: Array[Array[Float]], books: Array[Array[Array[Float]]],
    subDim: Int) extends BinaryExpression {

  override def left: Expression = listId
  override def right: Expression = codes

  override def checkInputDataTypes(): TypeCheckResult =
    (listId.dataType, codes.dataType) match {
      case (IntegerType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, array<int>), got " +
          s"${l.simpleString} and ${c.simpleString}")
    }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override def nullSafeEval(l: Any, c: Any): Any =
    PqReconstructRuntime.reconstruct(l.asInstanceOf[Int],
      c.asInstanceOf[ArrayData], coarse, books, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "float[][]")
    val booksRef = ctx.addReferenceObj("books", books, "float[][][]")
    nullSafeCodeGen(ctx, ev, (l, c) =>
      s"${ev.value} = graft.functions.PqReconstructRuntime.reconstruct($l, $c, $coarseRef, $booksRef, $subDim);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(listId = newLeft, codes = newRight)
}

object PqFunctions {
  def pqCodewords(codes: Column, books: Array[Array[Array[Float]]],
      subDim: Int): Column =
    SqlBridge.column(PqCodewords(SqlBridge.expression(codes), books, subDim))

  def pqReconstruct(listId: Column, codes: Column,
      coarse: Array[Array[Float]], books: Array[Array[Array[Float]]],
      subDim: Int): Column =
    SqlBridge.column(PqReconstruct(SqlBridge.expression(listId),
      SqlBridge.expression(codes), coarse, books, subDim))
}
