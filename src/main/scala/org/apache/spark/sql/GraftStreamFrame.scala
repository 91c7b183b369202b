package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` hook a V1 streaming `Source` needs: micro-batch
  * DataFrames handed back from `Source.getBatch` must carry
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor that sets the flag is `SparkSession.internalCreateDataFrame`
  * — the same call Spark's own `FileStreamSource` makes. This bridge
  * object lives in the `org.apache.spark.sql` package purely to reach it;
  * the standard pattern for out-of-tree V1 connectors. */
object GraftStreamFrame {
  def apply(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The sink-side mirror: re-plan a micro-batch's rows as a BATCH
    * frame a `Sink.addBatch` implementation can hand to ordinary batch
    * writers (the engine's incremental plan cannot be re-planned
    * directly). Rows are copied — `toRdd` iterators reuse row
    * instances. */
  def batch(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd.map(_.copy()), schema, isStreaming = false)
}
