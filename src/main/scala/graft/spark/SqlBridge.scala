package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals for the graft library's
  * custom Catalyst expressions (the supported extension idiom for
  * libraries shipping native expressions: live inside the sql package
  * namespace, as Delta/Sedona/etc. do).
  */
object SqlBridge {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its analyzed Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on an ALREADY-RUNNING session (session
    * extensions only apply at build time). Same builders as
    * [[graft.spark.GraftExtensions]]. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Run an assembled logical plan as a DataFrame — the hook a SQL text
    * surface needs after substituting its own relations into a parsed
    * plan (`Dataset.ofRows` is `private[sql]`; same bridge idiom as
    * above). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** The parquet readers' generated row-index column name
  * (`private[sql]` in Spark): a `readDataSchema` field with this name
  * is FILLED by both the vectorized and the record reader with each
  * row's index within its FILE — computed from row-group metadata, so
  * it stays correct under row-group/page skipping and splits. This is
  * the mechanism behind `_metadata.row_index`, and what lets the
  * deletion-vector scan keep data-filter pushdown. */
object RowIndexBridge {
  val TemporaryColumnName: String =
    org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      .ROW_INDEX_TEMPORARY_COLUMN_NAME
}

/** Bridge trait exposing Spark's `private[sql]`
  * [[org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters]]
  * to [[graft.spark.GraftDvScanBuilder]]: the deletion-vector scan
  * wrapper must receive catalyst filters so it can forward the
  * PARTITION-pruning subset (file-granular, position-safe) while
  * withholding data filters from the parquet reader. */
trait CatalystFilterPushdownBridge
  extends org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters

/** Companion helper: forward catalyst filters into an inner builder
  * whose pushdown trait is `private[sql]` and so cannot be NAMED from
  * graft packages. */
object CatalystFilterPushdownBridge {
  def push(b: org.apache.spark.sql.connector.read.ScanBuilder,
      filters: Seq[Expression]): Unit = b match {
    case p: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
      p.pushFilters(filters); ()
    case _ => ()
  }

  /** Full delegation (the SPJ wrapper): forward and return the inner
    * builder's own residual, so wrapped pushdown is byte-identical to
    * unwrapped. */
  def pushAll(b: org.apache.spark.sql.connector.read.ScanBuilder,
      filters: Seq[Expression]): Seq[Expression] = b match {
    case p: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
      p.pushFilters(filters)
    case _ => filters
  }

  /** The inner builder's reported pushed filters, for pass-through. */
  def pushed(b: org.apache.spark.sql.connector.read.ScanBuilder):
      Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    b match {
      case p: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
        p.pushedFilters
      case _ => Array.empty
    }
}
