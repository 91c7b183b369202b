package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent numeric aggregates.
  *
  * Floating-point `sum`/`avg` are order-dependent: partial aggregation
  * across partitions makes the last few ulps of a double sum depend on the
  * physical split, so the same query can hash differently between runs —
  * and between Spark and a single-threaded oracle engine. Summing in
  * DECIMAL is exact and associative, so the result is bit-identical no
  * matter how the shuffle lands. Cast back to double at the end.
  *
  * This matters doubly at 100 TB: thousands of partial aggregates, then a
  * final merge — decimal keeps the map-side combine (it is still an
  * associative hash-agg with partial pushdown) while removing the
  * nondeterminism.
  *
  * Oracle-side equivalents (DuckDB):
  *   dsum  -> CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
  *   davg  -> CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)
  *   dstd  -> sqrt((sxx - sx*sx/n) / (n-1)) from decimal sums of x, x*x
  */
object Deterministic {
  private val dec = DecimalType(28, 6)
  // Squares use (18,6)*(19,6) -> exact (38,12) in BOTH Spark and DuckDB.
  // Symmetric (18,6)*(18,6) overflows DuckDB's int64 fast path; (19,6)
  // forces int128 arithmetic there while Spark's (38,12) result needs no
  // precision-loss adjustment either. Neither side rounds.
  private val decSq = DecimalType(18, 6)
  private val decSqWide = DecimalType(19, 6)

  /** Exact decimal sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Order-independent mean: exact decimal sum / count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Order-independent sample stddev via exact decimal moments. */
  def dstddev(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = dsum(c)
    val sxx = sum(c.cast(decSq) * c.cast(decSqWide)).cast("double")
    when(n > 1, sqrt((sxx - sx * sx / n) / (n - lit(1.0)))).otherwise(lit(null))
  }
}
