package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared time-series primitives — the single definition both the batch
  * query pack (ts3) and the streaming stateful form
  * ([[graft.streaming.EventsStream.ewmaStream]]) are tested against.
  */
object TimeSeriesOps {
  private val dec = DecimalType(28, 6)

  /** Exact bounded EWMA over the events shape (α = 1/2, horizon 8):
    * appends `ewma` ordered per user by (ts, event_id). Weights are
    * powers of two, so the numerator is an exact DECIMAL lag-chain sum
    * and the normalizer 256 − 2^(8−n) an exact integer; the single
    * final division is the only float op — engine-independent and
    * window-parallel (8 lags, one partitioned sort, no sequential
    * cross-row dependency).
    */
  def withBoundedEwma(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val vd = col("value").cast(dec)
    val num = (0 until 8).map { j =>
      coalesce(lag(vd, j).over(w), lit(0).cast(dec)) * lit(1L << (7 - j))
    }.reduce(_ + _)
    val n = least(row_number().over(w), lit(8)).cast("double")
    val denom = lit(256.0) - pow(lit(2.0), lit(8.0) - n)
    df.withColumn("ewma", num.cast("double") / denom)
  }
}
