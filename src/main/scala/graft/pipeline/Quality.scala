package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime data-quality machinery (SURVEY.md §5 items 2–4): the
  * reference's per-layer validation rules
  * (`data/medallion_architecture.py:208-278`) and classification drift
  * detector (`utils/llm_classifier.py:365-418`) as distributed
  * DataFrame checks — no driver-side row loops.
  */
object Quality {

  /** Shared validator shape: each rule names the columns it needs and is
    * skipped when the frame doesn't carry them (the reference's
    * `if field in record` guard, `medallion_architecture.py:226,244,268`).
    * Emits one row per violating record with the violation-name array. */
  private def validate(df: DataFrame,
      checks: Seq[(String, Seq[String], Column)]): DataFrame = {
    val present = df.columns.toSet
    val active = checks.filter(_._2.forall(present))
    df.select(col("repository_id"),
      filter(array(active.map { case (name, _, cond) =>
        when(cond, name)
      }: _*), v => v.isNotNull).as("violations"))
      .filter(size(col("violations")) > 0)
  }

  /** Bronze-layer validation (medallion_architecture.py:212-234):
    * required ingest fields present, non-negative stars, positive id. */
  def validateBronze(bronze: DataFrame): DataFrame = {
    val required = Seq("repository_id", "name", "full_name", "owner_login",
      "created_at", "stargazers_count", "ingestion_timestamp")
    validate(bronze,
      required.map(f => (s"missing_$f", Seq(f), col(f).isNull)) ++ Seq(
        ("negative_stars", Seq("stargazers_count"), col("stargazers_count") < 0),
        ("non_positive_repository_id", Seq("repository_id"),
          col("repository_id") <= 0)))
  }

  /** Silver-layer validation (medallion_architecture.py:236-256 plus the
    * classification fields): required fields, score ranges [0,100],
    * non-negative counters and velocity metrics, confidence in [0,1]. */
  def validateSilver(silver: DataFrame): DataFrame =
    validate(silver, Seq(
      ("missing_repository_id", Seq("repository_id"), col("repository_id").isNull),
      ("missing_name", Seq("name"),
        col("name").isNull || trim(col("name")) === ""),
      ("quality_score_out_of_range", Seq("quality_score"),
        col("quality_score") < 0 || col("quality_score") > 100),
      ("activity_score_out_of_range", Seq("activity_score"),
        col("activity_score") < 0 || col("activity_score") > 100),
      ("community_health_score_out_of_range", Seq("community_health_score"),
        col("community_health_score") < 0 || col("community_health_score") > 100),
      ("negative_stars", Seq("stargazers_count"), col("stargazers_count") < 0),
      ("negative_forks", Seq("forks_count"), col("forks_count") < 0),
      ("negative_star_velocity", Seq("star_velocity_30d"),
        col("star_velocity_30d") < 0),
      ("negative_commit_frequency", Seq("commit_frequency_30d"),
        col("commit_frequency_30d") < 0),
      ("confidence_out_of_range", Seq("classification_confidence"),
        col("classification_confidence") < 0 || col("classification_confidence") > 1)))

  /** Gold-layer validation (medallion_architecture.py:259-278):
    * momentum score in range, every rank field positive. */
  def validateGold(gold: DataFrame): DataFrame = {
    val rankFields = Seq("popularity_rank", "growth_rank", "health_rank",
      "overall_rank", "category_rank")
    validate(gold,
      Seq(("momentum_score_out_of_range", Seq("momentum_score"),
        col("momentum_score") < 0 || col("momentum_score") > 100)) ++
        rankFields.map(f => (s"non_positive_$f", Seq(f), col(f) <= 0)))
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

  /** Per-repo drift change records (llm_classifier.py:372-418) — the
    * surface a reviewer consumes: one row per repo whose category
    * changed between runs, with old/new classification triples, the
    * confidence drop, a `requires_review` flag (drop > threshold), and
    * the reference's exact severity ladder (>0.5 high, >0.3 medium,
    * 0.9→<0.7 medium, else low). The reference's driver-side dict loop
    * becomes one inner equi-join shuffle on repository_id — the shape
    * that scales out. The reference's `timestamp` field is omitted
    * (datetime.now() — nondeterministic); stamp it at the sink if
    * needed. */
  def driftRecords(previous: DataFrame, current: DataFrame,
      confidenceThreshold: Double = 0.3): DataFrame = {
    val prev = previous.select(col("repository_id"),
      col("technology_category").as("old_category"),
      col("technology_subcategory").as("old_subcategory"),
      col("classification_confidence").as("old_confidence"))
    val cur = current.select(col("repository_id"),
      col("technology_category").as("new_category"),
      col("technology_subcategory").as("new_subcategory"),
      col("classification_confidence").as("new_confidence"))
    prev.join(cur, Seq("repository_id"))
      .filter(col("old_category") =!= col("new_category"))
      .withColumn("confidence_change",
        col("old_confidence") - col("new_confidence"))
      .withColumn("requires_review",
        col("confidence_change") > confidenceThreshold)
      .withColumn("drift_severity",
        when(col("confidence_change") > 0.5, "high")
          .when(col("confidence_change") > 0.3, "medium")
          .when(col("old_confidence") > 0.9 && col("new_confidence") < 0.7,
            "medium")
          .otherwise("low"))
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
