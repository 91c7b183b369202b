package graft.pipeline

import graft.functions.Deterministic._
import graft.functions.Scores._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver → Gold analytics (SURVEY.md §3.1; reference
  * `notebooks/silver_to_gold_analytics.py`): the seven market gold
  * tables as composable DataFrame programs. All double aggregates go
  * through exact decimal accumulation; rankings are total-ordered.
  */
object Gold {

  /** A1: 13-measure technology rollup (reference :132-159) + momentum +
    * lifecycle (:199-215). One hash-agg shuffle on the category. */
  def techMetrics(silver: DataFrame): DataFrame =
    silver.groupBy("technology_category")
      .agg(
        count(lit(1)).as("repository_count"),
        dsum(col("stargazers_count")).as("total_stars"),
        dsum(col("forks_count")).as("total_forks"),
        davg(col("stargazers_count")).as("avg_stars"),
        davg(col("quality_score")).as("avg_quality_score"),
        davg(col("momentum_score")).as("avg_momentum"),
        count(when(col("is_active"), 1)).as("active_repository_count"),
        countDistinct(col("license_category")).as("license_diversity"),
        davg(col("age_days")).as("avg_age_days"))
      .withColumn("lifecycle_stage", lifecycleStage(
        col("avg_age_days"), col("avg_momentum") * 10))

  /** A2: per-category daily trend with W4 share-of-day (reference
    * :410-422) — share from a windowed exact integer/decimal total. */
  def dailyTrend(silver: DataFrame): DataFrame =
    silver.groupBy("technology_category", "partition_date")
      .agg(
        count(lit(1)).as("repository_count"),
        dsum(col("stargazers_count")).as("total_stars"))
      .withColumn("date_total_stars",
        sum(col("total_stars")).over(Window.partitionBy("partition_date")))
      .withColumn("star_share",
        col("total_stars") / col("date_total_stars"))

  /** W2 + W1: per-category and global repo rankings (reference
    * :225-236, 364-370). Global rank is top-k-bounded — scale-safe. */
  def repoRankings(silver: DataFrame, topK: Int = 100): DataFrame = {
    val byCat = Window.partitionBy("technology_category")
      .orderBy(col("quality_score").desc, col("repository_id"))
    silver
      .select("repository_id", "full_name", "technology_category",
        "stargazers_count", "quality_score", "momentum_score")
      .withColumn("category_rank", row_number().over(byCat))
      .filter(col("category_rank") <= topK)
  }

  /** A3: tech health rollup with stddev (reference :459-470). */
  def techHealth(silver: DataFrame): DataFrame =
    silver.groupBy("technology_category")
      .agg(
        davg(col("quality_score")).as("avg_quality"),
        dstddev(col("stargazers_count").cast("double")).as("stars_stddev"),
        count(when(col("is_active"), 1)).as("active_count"),
        count(lit(1)).as("total_count"))
      .withColumn("health_grade",
        healthGrade(col("avg_quality")))

  /** A4: language stats (reference :513-528). */
  def languageStats(silver: DataFrame): DataFrame =
    silver.groupBy("language")
      .agg(
        count(lit(1)).as("repository_count"),
        dsum(col("stargazers_count")).as("total_stars"),
        count(when(col("is_active"), 1)).as("active_count"))

  /** A8: single-row market pulse (reference :574-576). */
  def marketPulse(silver: DataFrame): DataFrame =
    silver.agg(
      count(lit(1)).as("total_repositories"),
      dsum(col("stargazers_count")).as("total_stars"),
      davg(col("quality_score")).as("avg_quality"),
      countDistinct(col("technology_category")).as("category_count"))

  /** A5: topic ↔ category adoption matrix via explode (reference
    * :603-617), with the self-reference exclusion and HAVING ≥ 3. */
  def adoptionMatrix(silver: DataFrame, minCo: Long = 3): DataFrame =
    silver
      .select(col("technology_category"), col("stargazers_count"),
        explode(col("topics")).as("topic"))
      .filter(col("topic") =!= lower(col("technology_category")))
      .groupBy("technology_category", "topic")
      .agg(
        count(lit(1)).as("co_occurrence_count"),
        dsum(col("stargazers_count")).as("total_stars"))
      .filter(col("co_occurrence_count") >= minCo)

  /** Per-repo health dashboard (personal path, J3 + grades +
    * recommended-actions array — personal_repos_silver_to_gold.py:
    * 158-256,222-229): left join against activity metrics with
    * coalesce defaults, A–F grade, and a built-up actions array. */
  def healthDashboard(silver: DataFrame, activity: DataFrame): DataFrame = {
    val act = activity.select(
      col("repository_id"),
      col("commits_30d"), col("issues_30d"))
    silver
      .join(broadcast(act), Seq("repository_id"), "left")
      .withColumn("commits_30d", coalesce(col("commits_30d"), lit(0L)))
      .withColumn("issues_30d", coalesce(col("issues_30d"), lit(0L)))
      .withColumn("health_score",
        greatest(least(
          col("quality_score") * 0.5 + col("activity_score") * 0.3
            + when(col("commits_30d") > 0, 20.0).otherwise(0.0),
          lit(100.0)), lit(0.0)))
      .withColumn("health_grade", healthGrade(col("health_score")))
      .withColumn("recommended_actions",
        filter(array(
          when(col("days_since_push") > 180, "revive_or_archive"),
          when(length(col("description")) === 0, "add_description"),
          when(size(col("topics")) === 0, "add_topics"),
          when(col("commits_30d") === 0, "recent_activity_missing")),
          a => a.isNotNull))
      .select("repository_id", "full_name", "technology_category",
        "health_score", "health_grade", "commits_30d", "issues_30d",
        "recommended_actions")
  }

  /** All seven gold tables keyed by name — the reference's seven
    * saveAsTable targets (:270-644). */
  def allTables(silver: DataFrame): Map[String, DataFrame] = Map(
    "technology_metrics" -> techMetrics(silver),
    "daily_trend" -> dailyTrend(silver),
    "repo_rankings" -> repoRankings(silver),
    "tech_health" -> techHealth(silver),
    "language_stats" -> languageStats(silver),
    "market_pulse" -> marketPulse(silver),
    "adoption_matrix" -> adoptionMatrix(silver))
}
