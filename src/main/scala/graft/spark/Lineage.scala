package graft.spark

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * incremental dedup, BPE training): every iterated frame must be cut
  * from its ancestry or the logical plan — and Catalyst optimization
  * time — grows per round (doubling, when a frame feeds both sides of
  * a join).
  *
  * Default is `localCheckpoint(eager = true)`: fast, no configuration,
  * blocks live on executors. Its failure mode is durability — a lost
  * executor loses blocks that, unlike cached data, have NO lineage to
  * recompute from, killing a long convergence run. On a real cluster
  * set `spark.graft.checkpoint.dir` to a reliable path (HDFS/object
  * store) and every iterative operator switches to reliable
  * `checkpoint()` writes — same semantics, survives executor loss.
  */
object Lineage {

  /** Session conf key: when set, iterative operators use reliable
    * checkpoints rooted at this directory instead of executor-local
    * block storage. */
  val DirConf = "spark.graft.checkpoint.dir"

  def truncate(df: DataFrame): DataFrame = truncate(df, eager = true)

  /** Lazy variant: the plan is cut immediately, but materialization
    * rides the NEXT action over the frame (iterative operators follow
    * every round's checkpoint with a convergence aggregate — fusing
    * the two halves the actions per round; the aggregate computes over
    * the checkpointed RDD, so the blocks are stored as a side effect).
    *
    * The one-job-per-round fusion holds only for `localCheckpoint`. In
    * reliable mode (`spark.graft.checkpoint.dir` set) a lazy
    * `checkpoint()` would RECOMPUTE the frame when the checkpoint-file
    * job runs after the first action — roughly doubling every round on
    * a cluster — so the reliable branch always persists, checkpoints
    * eagerly (the write job reads the cached blocks), and unpersists:
    * one computation per round, at the cost of one extra (cache-read)
    * job. Durability is what the knob buys; the extra job is its price. */
  def truncateLazy(df: DataFrame): DataFrame = truncate(df, eager = false)

  private def truncate(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf) match {
      case Some(dir) if dir.nonEmpty =>
        // setCheckpointDir is idempotent for the same path; only touch
        // it when it doesn't already point inside the configured root
        if (!spark.sparkContext.getCheckpointDir.exists(_.startsWith(dir)))
          spark.sparkContext.setCheckpointDir(dir)
        val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try cached.checkpoint(eager = true)
        finally cached.unpersist(blocking = false)
      case _ => df.localCheckpoint(eager = eager)
    }
  }
}
