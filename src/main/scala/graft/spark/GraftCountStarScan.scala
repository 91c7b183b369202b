package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** METADATA-ONLY `COUNT(*)` (Delta/Iceberg parity): a plain
  * `SELECT count(*) FROM <catalog>.t` never needs a data page — the
  * manifest's file list plus per-file footer row counts (served from
  * the skipping index when present) minus the version's
  * deletion-vector positions IS the answer. This outermost builder
  * wrapper intercepts Spark's aggregate pushdown when the aggregation
  * is pure `CountStar` (no grouping, and NO filters were pushed — any
  * predicate routes to the normal scan) and replaces the whole scan
  * with one single-row partition carrying the count; Spark's final
  * aggregation sums the one partial row. At 100 TB that is O(files)
  * footer metadata once (then O(1) from the index) instead of reading
  * every row of the table. Kill switch: `spark.graft.sql.metadataCount
  * = false` restores the stock scan-and-count. Everything that is not
  * a bare count delegates verbatim to the wrapped builder chain
  * (dv / SPJ / skip / stock). */
class GraftCountStarBuilder(inner: ScanBuilder, countRows: () => Long)
  extends GraftForwardingScanBuilder(inner) {

  private var filtered = false
  private var countSchema: Option[StructType] = None

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]):
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (filters.nonEmpty) filtered = true
    super.pushFilters(filters)
  }

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val bareCount = !filtered &&
      aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    if (bareCount) {
      countSchema = Some(StructType(
        aggregation.aggregateExpressions.indices.map(i =>
          StructField(s"count_star_$i", LongType, nullable = false))))
      aggPushed = true
      true
    } else super.pushAggregation(aggregation)
  }

  /** Partial, not complete: the one emitted row is a count PARTIAL and
    * Spark's final aggregation sums it — the protocol every partition-
    * counted file source uses, with exactly one partition here. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    countSchema.isEmpty && super.supportCompletePushDown(aggregation)

  override def build(): Scan = countSchema match {
    case Some(schema) => new GraftCountStarScan(schema, countRows())
    case None => inner.build()
  }
}

class GraftCountStarScan(schema: StructType, count: Long)
  extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCountStarScan(rows=$count, metadata-only)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftCountPartition(count, schema.length))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCountReaderFactory
}

case class GraftCountPartition(count: Long, width: Int) extends InputPartition

class GraftCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[GraftCountPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(
          Array.fill[Any](cp.width)(cp.count))
      override def close(): Unit = ()
    }
  }
}
