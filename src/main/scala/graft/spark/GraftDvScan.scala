package graft.spark

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.StructType

/** The registered catalog's DELETION-VECTOR read path. The stock DSv2
  * `ParquetScan` reads files directly, so a vectored table would
  * RESURRECT deleted rows through plain `spark.sql` reads — this
  * wrapper anti-filters each file's vectored row POSITIONS at the
  * partition-reader level (Delta's row-index filter, expressed in V2
  * terms):
  *
  *   - NO filter pushdown: row-group/page skipping would break the
  *     positional count, so the builder only forwards column PRUNING
  *     (row order and count are unaffected) and Spark's Filter
  *     operator above the scan applies the full predicate — identical
  *     results, vectored tables pay the pushdown loss, clean tables
  *     never route here;
  *   - ONE WHOLE FILE per input partition (splits re-merged), so the
  *     running row count inside a reader IS the row's position;
  *   - the vectors load once per scan on the driver and ride a
  *     broadcast to the per-file reader wrappers.
  */
class GraftDvScanBuilder(inner: ScanBuilder, sidecars: Seq[String],
    partitionCols: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.graftbridge.CatalystFilterPushdownBridge {

  override def pruneColumns(requiredSchema: StructType): Unit = inner match {
    case p: SupportsPushDownRequiredColumns => p.pruneColumns(requiredSchema)
    case _ => ()
  }

  /** Forward ONLY the partition-pruning filters (file-granular, so
    * in-file row positions are untouched); withhold data filters from
    * the parquet reader (row-group/page skipping would break the
    * positional count) and report EVERYTHING as post-scan, so Spark
    * re-applies the full predicate above — identical results, and a
    * vectored 1000-partition table still scans one partition for a
    * partition-key query. */
  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]):
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    val pc = partitionCols.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val partitionOnly = filters.filter(f =>
      f.deterministic && f.references.nonEmpty &&
        f.references.forall(a => pc.contains(a.name.toLowerCase(java.util.Locale.ROOT))))
    org.apache.spark.sql.graftbridge.CatalystFilterPushdownBridge
      .push(inner, partitionOnly)
    filters // everything re-applies above the scan
  }

  /** Nothing is reported as pushed: the planner must keep the full
    * predicate (partition filters are re-applied too — free). */
  override def pushedFilters():
      Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def build(): Scan = new GraftDvScan(inner.build(), sidecars)
}

class GraftDvScan(inner: Scan, sidecars: Seq[String]) extends Scan with Batch {

  override def readSchema(): StructType = inner.readSchema()

  override def toBatch: Batch = this

  override def description(): String = s"GraftDvScan(${inner.description()})"

  /** Re-plan the inner scan's partitions as one-whole-file units. */
  override def planInputPartitions(): Array[InputPartition] = {
    val files = inner.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"GraftDvScan expected file partitions, got $other")
    }
    files.groupBy(_.filePath.toString).values.zipWithIndex.map {
      case (chunks, i) =>
        val f = chunks.head
        FilePartition(i, Array(f.copy(start = 0, length = f.fileSize)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // the positions load onto the DRIVER once per scan — bounded, like
    // the engine read path's broadcast cap: a table that accumulated
    // more vector bytes than this needs compaction, not a driver OOM
    val bytes = sidecars.map { p =>
      try java.nio.file.Files.size(java.nio.file.Paths.get(p))
      catch { case _: Exception => Long.MaxValue / 1024 }
    }.sum
    require(bytes <= GraftDvScan.MaxDriverVectorBytes,
      s"this table's deletion vectors total $bytes bytes — too large to " +
        "apply on the SQL scan path. Run OPTIMIZE (compaction " +
        "materializes the deletes and sheds the vectors), then re-query.")
    val dv: Map[String, Array[Long]] =
      spark.read.parquet(sidecars: _*).select("file", "pos").collect()
        .groupBy(r => GraftDvScan.baseName(r.getString(0)))
        .map { case (b, rows) => b -> rows.map(_.getLong(1)).distinct.sorted }
    new GraftDvReaderFactory(inner.toBatch.createReaderFactory(),
      spark.sparkContext.broadcast(dv))
  }
}

object GraftDvScan {
  private[spark] def baseName(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  /** Same order as the engine path's broadcast cap
    * (`ParquetCatalog.DvBroadcastBytes`). */
  private[spark] val MaxDriverVectorBytes: Long = 64L << 20
}

class GraftDvReaderFactory(inner: PartitionReaderFactory,
    dv: Broadcast[Map[String, Array[Long]]]) extends PartitionReaderFactory {

  /** Row readers only: the positional wrapper counts rows one by one. */
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = inner.createReader(p)
    val file = p.asInstanceOf[FilePartition].files.head.filePath.toString
    dv.value.get(GraftDvScan.baseName(file)) match {
      case None => r
      case Some(pos) => new PartitionReader[InternalRow] {
        private var i = -1L
        override def next(): Boolean = {
          while (r.next()) {
            i += 1
            if (java.util.Arrays.binarySearch(pos, i) < 0) return true
          }
          false
        }
        override def get(): InternalRow = r.get()
        override def close(): Unit = r.close()
      }
    }
  }
}
