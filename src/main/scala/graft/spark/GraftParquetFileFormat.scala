package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** [[ParquetFileFormat]] with parquet by-FIELD-ID column resolution
  * forced ON for the relations that use it — the catalog's column
  * mapping ([[graft.storage.ParquetCatalog.renameColumn]]) needs the
  * flag at read time, and this scopes it to the catalog's OWN readers
  * instead of mutating the session conf (v1 relation options are
  * case-folded before they reach the task-side hadoop conf, so they
  * cannot carry it; Delta's `DeltaParquetFileFormat` subclasses for
  * the same reason). Inert for requested schemas without ids, so an
  * unmapped table reads byte-identically to the stock format. */
class GraftParquetFileFormat extends ParquetFileFormat {

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    hadoopConf.setBoolean("spark.sql.parquet.fieldId.read.enabled", true)
    super.buildReaderWithPartitionValues(sparkSession, dataSchema,
      partitionSchema, requiredSchema, filters, options, hadoopConf)
  }

  override def toString: String = "GraftParquet"

  // ParquetFileFormat.equals is `other.isInstanceOf[ParquetFileFormat]`,
  // which would let plan-cache / exchange-reuse equality CONFLATE a
  // graft relation (field-id read forced on) with a stock parquet
  // relation over the same files — and hand one the other's reader.
  // Equal only to this exact class (Delta's DeltaParquetFileFormat
  // overrides for the same reason).
  override def equals(other: Any): Boolean =
    other != null && other.getClass == classOf[GraftParquetFileFormat]

  override def hashCode(): Int = classOf[GraftParquetFileFormat].hashCode()
}
