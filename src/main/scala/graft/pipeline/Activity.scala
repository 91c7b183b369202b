package graft.pipeline

import graft.functions.Deterministic._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Personal-portfolio activity analytics (SURVEY.md §3.2; reference
  * `notebooks/personal_repos_bronze_to_silver.py:574-634`,
  * `personal_repos_silver_to_gold.py:263-291`).
  *
  * The reference computes per-period metrics in a driver-side Python
  * loop (one aggregation job per period, then union). Here the periods
  * are EXPLODED into the frame and aggregated in a single pass — one
  * shuffle for all periods, which is the shape that survives 100 TB.
  * Long-format rows (`repository_id`, `measurement_period`, …) merge on
  * the composite key, the reference's K2 composite-key case.
  */
object Activity {

  /** Activity rows: (repository_id, activity_type, activity_id, ts,
    * additions, deletions). Emits one metrics row per repo × period. */
  def activityMetrics(activity: DataFrame, processingDate: Column,
      periods: Seq[Int] = Seq(7, 30, 90)): DataFrame = {
    val withPeriod = activity
      .withColumn("period_days",
        explode(array(periods.map(lit): _*)))
      .filter(col("ts") >= date_sub(processingDate, col("period_days")))
    withPeriod
      .groupBy(col("repository_id"),
        concat(col("period_days"), lit("d")).as("measurement_period"))
      .agg(
        count(when(col("activity_type") === "commit", 1)).as("commit_count"),
        count(when(col("activity_type") === "issue", 1)).as("issue_count"),
        coalesce(dsum(col("additions")), lit(0.0)).as("total_additions"),
        coalesce(dsum(col("deletions")), lit(0.0)).as("total_deletions"),
        max(col("ts")).as("last_activity_at"))
  }

  /** Weekly velocity trend (silver→gold :263-291): commits + net lines
    * per ISO week per repo. */
  def velocityTrend(activity: DataFrame): DataFrame =
    activity
      .groupBy(col("repository_id"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week_start"))
      .agg(
        count(when(col("activity_type") === "commit", 1)).as("commits"),
        (coalesce(dsum(col("additions")), lit(0.0))
          - coalesce(dsum(col("deletions")), lit(0.0))).as("net_lines"))
}
