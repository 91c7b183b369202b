package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Scale-safe global prefix sums (the [[Rank.globalRank]] pattern
  * applied to running totals): a `sum().over(Window.orderBy(...))`
  * with no partitioning moves the whole table through ONE reducer —
  * fine for a dashboard, fatal at 100 TB. Here: range-repartition by
  * the total order, accumulate within partitions, then add exclusive
  * per-partition offsets (driver sees one row per partition, never per
  * data row). The shuffle is the same range exchange a global sort
  * needs.
  *
  * `packSequences` builds on it for the LLM-training data-prep step
  * this enables: concatenate documents in a deterministic order and
  * chunk into fixed-capacity bins (greedy concat-then-chunk packing —
  * each document lands in the bin where it starts in the concatenated
  * token stream).
  */
object Prefix {

  /** Global running total of `valueCol` (cast to long; nulls count as
    * 0) over the total order given by `orderCols`, without a
    * single-partition window. Values may be negative — partition
    * offsets come from per-partition SUMs, not the (non-monotone when
    * negative) running max. */
  def globalCumsum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      cumCol: String = "cumsum"): DataFrame = {
    val spark = df.sparkSession
    val sortExprs = orderCols.map(col)
    val partitioned = df
      .withColumn(valueCol, coalesce(col(valueCol).cast(LongType), lit(0L)))
      .repartitionByRange(sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val vIdx = partitioned.schema.fieldIndex(valueCol)
    val withLocal = partitioned.rdd.mapPartitionsWithIndex {
      case (pid, rows) =>
        var acc = 0L
        rows.map { r =>
          acc += r.getLong(vIdx)
          Row.fromSeq(r.toSeq :+ pid :+ acc)
        }
    }
    val schema = StructType(partitioned.schema.fields :+
      StructField("__pid", IntegerType) :+ StructField("__cum", LongType))
    val local = spark.createDataFrame(withLocal, schema)
    // per-partition totals -> exclusive prefix offsets (one row per
    // partition on the driver); SUM, not max("__cum") — the running
    // cum is not monotone when values go negative
    val sizes = local.groupBy("__pid").agg(sum(col(valueCol)).as("total"))
      .orderBy("__pid").collect()
    val offsets = sizes.scanLeft(0L)(_ + _.getAs[Long]("total")).init
    val offsetMap = sizes.map(_.getAs[Int]("__pid")).zip(offsets).toMap
    val offsetExpr = offsetMap.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, off).otherwise(acc)
    }
    local.withColumn(cumCol, (col("__cum") + offsetExpr).cast(LongType))
      .drop("__pid", "__cum")
  }

  /** Sequence packing: assign each row the bin where it STARTS in the
    * concatenated token stream (`(cumsum - tokens) div capacity`) —
    * the standard greedy concat-then-chunk used to pack training
    * corpora into fixed context windows. Deterministic given the total
    * order; one range shuffle. */
  def packSequences(df: DataFrame, orderCols: Seq[String], tokenCol: String,
      capacity: Long, binCol: String = "bin_id"): DataFrame = {
    require(capacity > 0)
    globalCumsum(df, orderCols, tokenCol, "cum_tokens")
      .withColumn(binCol,
        expr(s"(cum_tokens - $tokenCol) div $capacity").cast(LongType))
  }
}
