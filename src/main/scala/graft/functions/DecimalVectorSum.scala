package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Element-wise exact decimal sum over an `array<float>` column — the
  * Lloyd-round update (KMeans / ProductQuantizer training) as ONE
  * aggregate instead of `dim` of them.
  *
  * The original formulations paid for exactness twice: the posexplode
  * form materialized dim× the corpus rows per round, and the
  * dim-aggregate-columns form put `dim` cast+sum expressions into the
  * plan, which pushed per-iteration analysis past the round's actual
  * work at gate scale. This aggregate keeps the EXACT same numbers —
  * per element it computes the identical unscaled value as
  * `CAST(CAST(x AS DOUBLE) AS DECIMAL(28,6))` (BigDecimal.valueOf =
  * the shortest-repr double conversion Spark's Cast uses, then
  * HALF_UP at scale 6) and accumulates unscaled BigIntegers, which is
  * the same exact integer arithmetic as Spark's DECIMAL(38,6) sum —
  * then emits `CAST(sum AS DOUBLE)` per dimension
  * (BigDecimal(unscaled, 6).doubleValue, Spark's Decimal.toDouble).
  * Order-independent, partitioning-independent, bit-identical.
  *
  * Contract (the trainers' invariant, enforced upstream by their
  * uniform-dimension check): vectors are non-null with non-null
  * elements; shorter vectors contribute only their elements.
  */
case class DecimalVectorSum(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[BigInteger]] {

  require(dim > 0, "dim must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "decimal_vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[BigInteger] =
    Array.fill(dim)(BigInteger.ZERO)

  override def update(buf: Array[BigInteger], input: InternalRow): Array[BigInteger] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          // identical to Spark's CAST(double AS DECIMAL(_,6)):
          // shortest-decimal double repr, then HALF_UP at scale 6
          val scaled = JBigDecimal.valueOf(a.getFloat(i).toDouble)
            .setScale(6, RoundingMode.HALF_UP).unscaledValue()
          buf(i) = buf(i).add(scaled)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[BigInteger], other: Array[BigInteger]): Array[BigInteger] = {
    var i = 0
    while (i < dim) { buf(i) = buf(i).add(other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[BigInteger]): Any =
    new GenericArrayData(buf.map(bi =>
      new JBigDecimal(bi, 6).doubleValue(): Any))

  override def serialize(buf: Array[BigInteger]): Array[Byte] = {
    val parts = buf.map(_.toByteArray)
    val bb = ByteBuffer.allocate(4 + parts.map(4 + _.length).sum)
    bb.putInt(parts.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[BigInteger] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n) {
      val len = bb.getInt
      val p = new Array[Byte](len)
      bb.get(p)
      new BigInteger(p)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): DecimalVectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DecimalVectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object VectorAggregates {
  /** Column API: exact per-dimension decimal sums of an `array<float>`
    * column, as `array<double>` — bit-identical to `dim` separate
    * `CAST(SUM(CAST(CAST(element_at(v, i) AS DOUBLE) AS DECIMAL(28,6)))
    * AS DOUBLE)` aggregates. */
  def dsumVec(vec: Column, dim: Int): Column =
    SqlBridge.column(
      DecimalVectorSum(SqlBridge.expression(vec), dim).toAggregateExpression())
}
