package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe global ranking (SURVEY.md §4 "global windows at scale"):
  * the reference ranks with `row_number().over(Window.orderBy(...))` —
  * an unpartitioned window that moves the whole table through ONE
  * reducer (`silver_to_gold_analytics.py:225-236`). Two scale paths:
  *
  *   - `topK`: rank only the head — TakeOrderedAndProject pushes the
  *     per-partition top-k map-side, the driver merges k·partitions
  *     rows. Right when only leaders matter (the reference's use case).
  *
  *   - `globalRank`: rank EVERY row without a single-partition window:
  *     range-repartition by the sort key, rank within partitions, then
  *     add per-partition offsets computed from partition sizes (a
  *     two-pass zipWithIndex in DataFrame terms). Shuffle is the same
  *     range exchange a global sort needs; no reducer sees more than
  *     its slice.
  */
object Rank {

  /** Rank the global top-k by `orderCols` (must form a total order). */
  def topK(df: DataFrame, k: Int, orderCols: Seq[String]): DataFrame = {
    val sorted = df.orderBy(orderCols.map(c => col(c)): _*).limit(k)
    import org.apache.spark.sql.expressions.Window
    sorted.withColumn("rank",
      row_number().over(Window.orderBy(orderCols.map(c => col(c)): _*)))
  }

  /** Dense global row_number over a total order, computed without a
    * single-partition window. */
  def globalRank(df: DataFrame, orderCols: Seq[String],
      rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val sortExprs = orderCols.map(col)
    val partitioned = df.repartitionByRange(sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val withLocal = partitioned.rdd.mapPartitionsWithIndex {
      case (pid, rows) =>
        var i = 0L
        rows.map { r => i += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ i) }
    }
    val schema = org.apache.spark.sql.types.StructType(
      partitioned.schema.fields :+
        org.apache.spark.sql.types.StructField("__pid", org.apache.spark.sql.types.IntegerType) :+
        org.apache.spark.sql.types.StructField("__local", LongType))
    val local = spark.createDataFrame(withLocal, schema)
    // per-partition sizes -> exclusive prefix offsets (driver-side: one
    // row per partition, never per data row)
    val sizes = local.groupBy("__pid").agg(max("__local").as("n"))
      .orderBy("__pid").collect()
    val offsets = sizes.scanLeft(0L)(_ + _.getAs[Long]("n")).init
    val offsetMap = sizes.map(_.getAs[Int]("__pid")).zip(offsets).toMap
    val offsetExpr = offsetMap.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, off).otherwise(acc)
    }
    local.withColumn(rankCol, (col("__local") + offsetExpr).cast(LongType))
      .drop("__pid", "__local")
  }
}
