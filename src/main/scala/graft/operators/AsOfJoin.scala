package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampType}

/** As-of (point-in-time) join — the canonical operator Spark lacks
  * natively (SURVEY.md guidance (a): compose existing ops). For each
  * left row (key, ts) attach the payload of the nearest right row with
  * the same key at-or-before `ts` (`direction = "backward"`, the
  * default) or at-or-after it (`"forward"`), optionally only when that
  * nearest row is within `toleranceSec` — pandas `merge_asof` parity.
  *
  * Implementation is the union-and-carry pattern: tag both sides, union
  * them, and per key carry the last non-null right payload forward over
  * event-time order with `last(..., ignoreNulls = true)` (reversed
  * order for forward) — ONE shuffle on the key (the window's partition
  * exchange), never a range cross product. At 100 TB this is the only
  * shape that works: a naive `l.ts >= r.ts` theta join is quadratic per
  * key. Tolerance is a post-carry null-out against the carried match
  * timestamp — no second join.
  *
  * Right rows must be unique per (key, rightTs) — enforce upstream —
  * so the result is deterministic; ties (`rightTs == ts`) match in both
  * directions, as in standard ASOF semantics.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      direction: String = "backward",
      toleranceSec: Option[Double] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadCols = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val leftCols = left.columns.toSeq
    val rtsType = right.schema(rightTs).dataType

    val taggedRight = right.select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        col(rightTs).as("__rts") +: payloadCols.map(col)) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        lit(null).cast(rtsType).as("__rts") +:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))) ++
        leftCols.filterNot(c => c == key).map(col): _*)

    // right rows (tag 0) sort before left rows at equal timestamps =>
    // a right row taking effect AT ts is visible to that ts's left rows
    // (in forward mode the time order is reversed, tag order kept)
    val ord: Seq[Column] =
      if (direction == "backward") Seq(col("__ts"), col("__tag"))
      else Seq(col("__ts").desc, col("__tag"))
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("__rts" +: payloadCols)
      .foldLeft(taggedRight.unionByName(taggedLeft)) {
        case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    val matchedOnly = carried.filter(col("__tag") === 1)

    val withTol = toleranceSec match {
      case Some(tol) =>
        def epoch(c: Column, dt: DataType): Column = dt match {
          case TimestampType => unix_micros(c).cast("double") / 1e6
          case _ => c.cast("double")
        }
        val lts = epoch(col("__ts"), matchedOnly.schema("__ts").dataType)
        val rts = epoch(col("__rts"), rtsType)
        val diff = if (direction == "backward") lts - rts else rts - lts
        val ok = col("__rts").isNotNull && diff <= tol
        payloadCols.foldLeft(matchedOnly) { case (df, c) =>
          df.withColumn(c, when(ok, col(c)))
        }
      case None => matchedOnly
    }
    withTol.select((col(key) +: col("__ts").as(leftTs) +:
      leftCols.filterNot(c => c == key || c == leftTs).map(col)) ++
      payloadCols.map(col): _*)
  }
}
