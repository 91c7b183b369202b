package graft.spark

import org.apache.spark.sql.SparkSession

/** Shuffle/AQE pinning for iterative driver loops (Lloyd rounds, label
  * propagation, BPE merge rounds).
  *
  * The frames these loops shuffle on the REDUCE side are model- or
  * dup-set-sized — k·dim centroid stats, pair counts bounded by the
  * vocabulary, labels over duplicate-edge endpoints — not corpus-sized
  * (map-side partial aggregation compacts corpus scans before the
  * wire). At that size the session default of one shuffle partition
  * per core plus an AQE re-planning pass per stage costs more per
  * round than the data: measured on the connected-components loop, a
  * few hundred edges took ~0.6 s/round of pure scheduling before
  * pinning. Pinning a handful of partitions and disabling adaptive
  * re-planning inside the loop removes that constant without touching
  * the operators' one-shuffle-per-round shape.
  *
  * Scale contract: the pinned width is `spark.graft.loop.partitions`
  * (default 4). On a large cluster where the dup-edge set itself is
  * huge (label propagation over billions of duplicate docs), raise it
  * — the knob exists precisely so the 100× path is a deliberate
  * choice, not a silent recompile.
  *
  * Conf changes are session-wide while the body runs; callers only
  * wrap driver-side loops whose actions all execute inside (Spark
  * reads `spark.sql.shuffle.partitions` at action-planning time, so
  * frames RETURNED from the body plan under the caller's restored
  * conf).
  */
object Loop {

  /** Session conf key: shuffle width inside pinned iterative loops. */
  val PartitionsConf = "spark.graft.loop.partitions"

  def pinned[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    val saved = keys.map(c => c -> spark.conf.getOption(c))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.conf.getOption(PartitionsConf).getOrElse("4"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
