package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType,
  Decimal, DecimalType, IntegerType, LongType, ShortType, StringType,
  StructType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The catalog's `bucket(n, col)` V2 function — what lets Spark's
  * storage-partitioned-join machinery recognize two graft tables
  * bucketed by the same column count as CO-PARTITIONED (SPARK-37377's
  * bucket-transform case; Iceberg registers its bucket function the
  * same way). The hash is EXACTLY catalyst's `hash(col)` (Murmur3,
  * seed 42) followed by `pmod`, i.e. byte-identical to what
  * [[graft.storage.ParquetCatalog.overwriteBucketedVersioned]]
  * computed at write time — mandatory, because Spark may EVALUATE this
  * function (push-part-values / partially-clustered handling), and a
  * divergent hash would misroute rows.
  *
  * Supported key types are every integral-backed catalyst type plus
  * strings and decimals — the realistic join-key set (numeric ids,
  * string ids, date/timestamp keys, decimal ids). FLOAT/DOUBLE are
  * deliberately excluded: ±0.0/NaN hash normalization makes them
  * treacherous bucket keys and no sane layout buckets on them. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): catalyst-Murmur3 hash bucket id"

  /** The exact type set [[bind]] accepts — the write verb validates
    * against THIS before declaring a bucket layout, so a table can
    * never carry a spec whose runtime re-planning would crash. */
  def supports(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType | ShortType | ByteType |
        BooleanType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"bucket expects (int numBuckets, value), got $inputType")
    val vt = inputType.fields(1).dataType
    if (supports(vt)) new GraftBoundBucket(vt)
    else throw new UnsupportedOperationException(
      s"bucket over $vt is not supported (integral types, string, date, " +
        "timestamp, decimal are)")
  }
}

/** `pmod(murmur3(value, 42), n)` over catalyst-internal values — each
  * branch mirrors catalyst `Murmur3Hash`'s per-type hashing (ints and
  * int-backed DATE via hashInt, longs and long-backed TIMESTAMP via
  * hashLong, compact decimals as their unscaled long, wide decimals as
  * the unscaled BigInteger's bytes), verified equal to
  * `pmod(functions.hash(col), n)` by PropertySpec across all types. */
final class GraftBoundBucket(valueType: DataType)
  extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = true
  /** Structural-equality key for SPJ compatibility checks: two scans
    * report the same transform iff this matches (plus the literal
    * numBuckets child, which Spark compares itself). */
  override def canonicalName(): String = s"graft.bucket($valueType)"

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val h = valueType match {
      case LongType | TimestampType | TimestampNTZType =>
        Murmur3_x86_32.hashLong(input.getLong(1), 42)
      case IntegerType | DateType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
      case ShortType => Murmur3_x86_32.hashInt(input.getShort(1).toInt, 42)
      case ByteType => Murmur3_x86_32.hashInt(input.getByte(1).toInt, 42)
      case BooleanType =>
        Murmur3_x86_32.hashInt(if (input.getBoolean(1)) 1 else 0, 42)
      case StringType =>
        val s = input.get(1, StringType).asInstanceOf[UTF8String]
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 42)
      case d: DecimalType =>
        val dec = input.getDecimal(1, d.precision, d.scale)
        if (d.precision <= Decimal.MAX_LONG_DIGITS)
          Murmur3_x86_32.hashLong(dec.toUnscaledLong, 42)
        else {
          val bytes = dec.toJavaBigDecimal.unscaledValue().toByteArray
          Murmur3_x86_32.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42)
        }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    // sql pmod: ((h % n) + n) % n
    ((h % n) + n) % n
  }
}
