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
      // activity status + attention flag (reference :211-223)
      .withColumn("activity_status", activityStatus(col("days_since_push")))
      .withColumn("attention_needed",
        col("health_grade").isin("D", "F") ||
          col("activity_status") === "dormant" ||
          col("issues_30d") > 10)
      .withColumn("recommended_actions",
        filter(array(
          when(col("days_since_push") > 180, "revive_or_archive"),
          when(length(col("description")) === 0, "add_description"),
          when(size(col("topics")) === 0, "add_topics"),
          when(col("commits_30d") === 0, "recent_activity_missing")),
          a => a.isNotNull))
      .select("repository_id", "full_name", "technology_category",
        "health_score", "health_grade", "activity_status",
        "attention_needed", "commits_30d", "issues_30d",
        "recommended_actions")
  }

  /** Personal portfolio overview (personal_repos_silver_to_gold.py:
    * 101-149) — one summary row: repo/star/fork totals, activity level,
    * top-5 technology and language arrays, diversity score. The
    * reference computes the top-5 arrays and ratios driver-side
    * (`.collect()` loops, :121-137); here they are single-pass
    * aggregates — ordered `collect_list(struct)` over the (small,
    * already-aggregated) per-category counts, sliced to 5 — so nothing
    * leaves the executors until the final one-row result. */
  def portfolioOverview(silver: DataFrame, processingDate: String): DataFrame = {
    val base = silver.agg(
      count(lit(1)).as("total_repositories"),
      dsum(col("stargazers_count")).as("total_stars"),
      dsum(col("forks_count")).as("total_forks"),
      count(when(col("is_active"), 1)).as("active_repositories"),
      davg(col("quality_score")).as("avg_quality_score"),
      dsum(col("size_kb").cast("double") / 1024.0).as("total_size_mb"))
    def top5(c: String, alias: String) =
      silver.filter(col(c).isNotNull).groupBy(c).agg(count(lit(1)).as("n"))
        .agg(
          slice(transform(
            array_sort(collect_list(struct((-col("n")).as("nn"), col(c).as("v")))),
            s => s.getField("v")), 1, 5).as(alias),
          least(count(lit(1)), lit(5L)).as(s"__${alias}_n"))
    base
      .crossJoin(top5("technology_category", "primary_technologies"))
      .crossJoin(top5("language", "primary_languages"))
      .withColumn("portfolio_diversity_score",
        (col("__primary_technologies_n") / greatest(col("total_repositories"), lit(1L))
          + col("__primary_languages_n") / greatest(col("total_repositories"), lit(1L)))
          / 2.0)
      .withColumn("activity_level",
        when(col("active_repositories") / col("total_repositories") >= 0.7, "high")
          .when(col("active_repositories") / col("total_repositories") >= 0.3, "medium")
          .otherwise("low"))
      .withColumn("measurement_date", lit(processingDate))
      .drop("__primary_technologies_n", "__primary_languages_n")
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
