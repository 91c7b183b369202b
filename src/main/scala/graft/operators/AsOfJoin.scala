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

    // the whole right row is carried as ONE struct, so the matched
    // timestamp and payload values stay atomic — carrying them as
    // separate last(ignoreNulls) columns would let a null payload VALUE
    // on the nearest row fall through to an older row's value while
    // __rts pointed at the nearest (wrong match, and wrong tolerance
    // verdict). With the struct, a nearest row whose payload is null
    // yields null — merge_asof's "value of the nearest row" semantics.
    val matchStruct = struct(
      col(rightTs).as("__rts") +: payloadCols.map(col): _*)
    // a NULL right timestamp is not an event in time: standard ASOF /
    // merge_asof semantics never match it, but nulls-first ordering
    // would sort such a row before every row in its key partition and
    // let left rows inherit its payload — filter it out before tagging
    val taggedRight = right.filter(col(rightTs).isNotNull).select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        matchStruct.as("__match") +: Nil) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val nullMatch = lit(null).cast(
      taggedRight.schema("__match").dataType).as("__match")
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        nullMatch +: Nil) ++
        leftCols.filterNot(c => c == key).map(col): _*)

    // right rows (tag 0) sort before left rows at equal timestamps =>
    // a right row taking effect AT ts is visible to that ts's left rows.
    // Forward mode reverses time order but keeps nulls FIRST (desc's
    // default is nulls last) so a null-ts left row matches nothing in
    // either direction.
    val ord: Seq[Column] =
      if (direction == "backward") Seq(col("__ts"), col("__tag"))
      else Seq(col("__ts").desc_nulls_first, col("__tag"))
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedOnly = taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val withTol = toleranceSec match {
      case Some(tol) =>
        // compare in LONG MICROS, not double seconds: the double
        // round-trip (unix_micros/1e6 twice) rounds each side, so a
        // diff exactly at the bound could flip the <= verdict relative
        // to an exact integer comparison (the j10 oracle's
        // epoch_us(a) - epoch_us(b) <= tol * 1000000)
        val tolMicros = math.round(tol * 1e6)
        def epochMicros(c: Column, dt: DataType): Column = dt match {
          case TimestampType => unix_micros(c)
          case _ => round(c.cast("double") * 1e6).cast("long")
        }
        val lts = epochMicros(col("__ts"), matchedOnly.schema("__ts").dataType)
        val rts = epochMicros(col("__match.__rts"), rtsType)
        val diff = if (direction == "backward") lts - rts else rts - lts
        val ok = col("__match").isNotNull && diff <= tolMicros
        matchedOnly.withColumn("__match", when(ok, col("__match")))
      case None => matchedOnly
    }
    withTol.select((col(key) +: col("__ts").as(leftTs) +:
      leftCols.filterNot(c => c == key || c == leftTs).map(col)) ++
      payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
