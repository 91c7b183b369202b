package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructType}
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
  * divergent hash would misroute rows. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): catalyst-Murmur3 hash bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"bucket expects (int numBuckets, value), got $inputType")
    inputType.fields(1).dataType match {
      case LongType | IntegerType | StringType =>
        new GraftBoundBucket(inputType.fields(1).dataType)
      case other => throw new UnsupportedOperationException(
        s"bucket over $other is not supported (long, int, string are)")
    }
  }
}

/** `pmod(murmur3(value, 42), n)` over catalyst-internal values. */
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
      case LongType => Murmur3_x86_32.hashLong(input.getLong(1), 42)
      case IntegerType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
      case StringType =>
        val s = input.get(1, StringType).asInstanceOf[UTF8String]
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 42)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    // sql pmod: ((h % n) + n) % n
    ((h % n) + n) % n
  }
}
