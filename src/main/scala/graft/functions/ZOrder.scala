package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-interleaved Z-order (Morton) key over 2–4 bucketed columns — the
  * multi-column data-layout primitive behind
  * [[graft.storage.ParquetCatalog.compact]]'s `zorderBy`.
  *
  * Why not just sort lexicographically: a lexicographic sort gives the
  * FIRST column tight per-file min/max stats and leaves every later
  * column's ranges spanning the whole domain, so parquet row-group /
  * file skipping only works for filters on that first column.
  * Interleaving the bits makes every file a hypercube in bucket space:
  * min/max stays tight on ALL clustered columns simultaneously, and a
  * scan with a predicate on ANY of them prunes (ZOrderSpec measures
  * files-touched on the second column: interleaved ≪ lexicographic).
  *
  * Built by COMPOSING codegen'd built-ins (shift/mask/or — they
  * constant-fold into one projection), not a custom expression: the
  * bits·n term expansion is small and Catalyst handles it natively.
  */
object ZOrder {

  /** Morton key: output bit (b·n + c) = bit b of column c. Inputs are
    * bucket ordinals, clamped into [0, 2^bits); n·bits ≤ 63. */
  def zorderKey(bits: Int, cols: Column*): Column = {
    val n = cols.size
    require(n >= 2 && n <= 4, s"zorder interleaves 2-4 columns, got $n")
    require(bits >= 1 && bits * n <= 63,
      s"bits=$bits × $n columns must fit in 63 bits")
    cols.zipWithIndex.flatMap { case (c0, ci) =>
      val c = least(greatest(c0.cast("long"), lit(0L)),
        lit((1L << bits) - 1))
      (0 until bits).map(b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + ci))
    }.reduce(_.bitwiseOR(_))
  }

  /** Driver-side Morton key — identical math to [[zorderKey]], for
    * tests and model-sized computations. */
  def mortonKey(bits: Int, vals: Int*): Long = {
    val mask = (1 << bits) - 1
    var out = 0L
    for (b <- 0 until bits; c <- vals.indices) {
      val v = math.min(math.max(vals(c), 0), mask)
      out |= ((v >> b) & 1L) << (b * vals.size + c)
    }
    out
  }

  /** Equi-width bucket ordinal in [0, 2^bits) from explicit bounds —
    * the O(1) normalization `compact` feeds zorderKey (bounds come
    * from one min/max aggregate, never a global ranking window). */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = 1 << bits
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(span) * buckets).cast("int"),
      lit(0)), lit(buckets - 1))
  }
}
