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
    * single-partition window: range-partition by the sort key, tag each
    * row with its range-partition id, rank WITHIN partitions by a
    * window partitioned on that id (every window group is one bounded
    * range slice), and add exclusive per-partition offsets computed
    * from the partition sizes (driver sees one row per partition, never
    * per data row). Stays entirely inside Catalyst/codegen — the
    * earlier RDD `mapPartitionsWithIndex` roundtrip paid external-row
    * conversion for every data row and hid the frame from the
    * optimizer. The tagged frame persists because the size aggregate
    * and the ranking pass both read it (one range shuffle, not two). */
  def globalRank(df: DataFrame, orderCols: Seq[String],
      rankCol: String = "rank"): DataFrame =
    globalRankN(df, orderCols, rankCol)._1

  /** [[globalRank]] plus the TOTAL row count — already known from the
    * per-partition size collect, so consumers that need N (equi-depth
    * bucketing) don't pay a separate count job. */
  def globalRankN(df: DataFrame, orderCols: Seq[String],
      rankCol: String = "rank"): (DataFrame, Long) = {
    val sortExprs = orderCols.map(col)
    val tagged = df.repartitionByRange(sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val sizes = tagged.groupBy("__pid").agg(count(lit(1)).as("n"))
      .orderBy("__pid").collect()
    val offsets = sizes.scanLeft(0L)(_ + _.getAs[Long]("n")).init
    val offsetMap = sizes.map(_.getAs[Int]("__pid")).zip(offsets).toMap
    val offsetExpr = offsetMap.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, off).otherwise(acc)
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__pid").orderBy(sortExprs: _*)
    val ranked = tagged
      .withColumn(rankCol,
        (row_number().over(w).cast(LongType) + offsetExpr).cast(LongType))
      .drop("__pid")
    (ranked, sizes.map(_.getAs[Long]("n")).sum)
  }
}
