package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared helpers for in-query verification pins. */
object Pins {

  /** Multiset symmetric-difference size — the same number as
    * `a.exceptAll(b).count() + b.exceptAll(a).count()`, computed as ONE
    * action over per-key counts instead of two full-row except plans.
    *
    * `exceptAll` shuffles entire rows of both inputs, and the
    * two-directional pin pays that twice. Grouping each side first
    * compacts it map-side to one (row-value, n) count row per distinct
    * row, so the wire carries counts instead of payloads (optimization
    * guide §2.3, "aggregate before you shuffle"), and one full-outer
    * join of the two count frames answers both directions at once:
    * Σ |n_a − n_b| = |A∖B| + |B∖A| over multisets.
    *
    * Rows are keyed as a single struct so NULL fields compare equal in
    * the join (struct equality is ordering-based), matching exceptAll's
    * NULL-as-equal multiset semantics.
    */
  def symmetricDiffCount(a: DataFrame, b: DataFrame): Long = {
    require(a.columns.sameElements(b.columns),
      s"column mismatch: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    def counted(df: DataFrame, n: String) =
      df.select(struct(df.columns.toSeq.map(col): _*).as("__k"))
        .groupBy("__k").agg(count(lit(1)).as(n))
    counted(a, "__na").join(counted(b, "__nb"), Seq("__k"), "full_outer")
      .agg(coalesce(sum(abs(coalesce(col("__na"), lit(0L)) -
        coalesce(col("__nb"), lit(0L)))), lit(0L)).as("__d"))
      .head().getLong(0)
  }
}
