package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical operator Spark lacks
  * natively (SURVEY.md guidance (a): compose existing ops). For each
  * left row (key, ts) attach the payload of the most recent right row
  * with the same key and `rightTs <= ts`.
  *
  * Implementation is the union-and-carry pattern: tag both sides, union
  * them, and per key carry the last non-null right payload forward over
  * event-time order with `last(..., ignoreNulls = true)` — ONE shuffle
  * on the key (the window's partition exchange), never a range cross
  * product. At 100 TB this is the only shape that works: a naive
  * `l.ts >= r.ts` theta join is quadratic per key.
  *
  * Right rows must be unique per (key, rightTs) — enforce upstream —
  * so the result is deterministic; ties (`rightTs == ts`) match, as in
  * standard ASOF semantics.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val leftCols = left.columns.toSeq

    val taggedRight = right.select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        payloadCols.map(col)) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))) ++
        leftCols.filterNot(c => c == key).map(col): _*)

    // right rows (tag 0) sort before left rows at equal timestamps =>
    // a right row taking effect AT ts is visible to that ts's left rows
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1)
      .select((col(key) +: col("__ts").as(leftTs) +:
        leftCols.filterNot(c => c == key || c == leftTs).map(col)) ++
        payloadCols.map(col): _*)
  }
}
