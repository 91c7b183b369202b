package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime data-quality machinery (SURVEY.md §5 items 2–4): the
  * reference's per-layer validation rules
  * (`data/medallion_architecture.py:208-278`) and classification drift
  * detector (`utils/llm_classifier.py:365-418`) as distributed
  * DataFrame checks — no driver-side row loops.
  */
object Quality {

  /** Silver-layer validation: one row per violation (empty => valid).
    * Rules: required fields, score ranges [0,100], non-negative
    * counters. */
  def validateSilver(silver: DataFrame): DataFrame = {
    val checks = Seq(
      ("missing_repository_id", col("repository_id").isNull),
      ("missing_name", col("name").isNull || trim(col("name")) === ""),
      ("quality_score_out_of_range",
        col("quality_score") < 0 || col("quality_score") > 100),
      ("activity_score_out_of_range",
        col("activity_score") < 0 || col("activity_score") > 100),
      ("negative_stars", col("stargazers_count") < 0),
      ("negative_forks", col("forks_count") < 0),
      ("confidence_out_of_range",
        col("classification_confidence") < 0 || col("classification_confidence") > 1))
    silver.select(col("repository_id"),
      filter(array(checks.map { case (name, cond) =>
        when(cond, name)
      }: _*), v => v.isNotNull).as("violations"))
      .filter(size(col("violations")) > 0)
  }

  /** Classification drift between two runs: per-category counts joined
    * full-outer, with churn = reclassified repos. Severity thresholds
    * mirror the reference's detector. */
  def classificationDrift(previous: DataFrame, current: DataFrame): DataFrame = {
    val prev = previous.select(col("repository_id"),
      col("technology_category").as("prev_category"))
    val cur = current.select(col("repository_id"),
      col("technology_category").as("cur_category"))
    val joined = prev.join(cur, Seq("repository_id"), "full_outer")
    joined
      .withColumn("status",
        when(col("prev_category").isNull, "added")
          .when(col("cur_category").isNull, "removed")
          .when(col("prev_category") =!= col("cur_category"), "reclassified")
          .otherwise("stable"))
      .groupBy("prev_category", "cur_category", "status")
      .agg(count(lit(1)).as("n_repos"))
  }

  /** Scalar drift summary: fraction reclassified, with a severity
    * label (info < 10% <= warn < 25% <= critical). */
  def driftSeverity(drift: DataFrame): DataFrame = {
    // sum() over an empty frame is null — coalesce before getLong, and
    // emit (0.0, "info") rather than dividing by a zero total
    val total = drift.agg(coalesce(sum(col("n_repos")), lit(0L)))
      .head().getLong(0).toDouble
    drift.filter(col("status") === "reclassified")
      .agg(coalesce(sum(col("n_repos")), lit(0L)).as("reclassified"))
      .withColumn("fraction",
        if (total == 0.0) lit(0.0) else col("reclassified") / lit(total))
      .withColumn("severity",
        when(col("fraction") >= 0.25, "critical")
          .when(col("fraction") >= 0.10, "warn")
          .otherwise("info"))
  }
}
