package graft.pipeline

import graft.functions.Scores._
import graft.model.Schemas
import graft.operators.Upsert
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bronze → Silver transformation (SURVEY.md §3.1; reference
  * `notebooks/bronze_to_silver_transformation.py`). Deterministic by
  * construction: the processing date is a parameter, not
  * `current_date()`, and the placeholder `rand()` commit-frequency of
  * the reference is replaced by a seedless hash-derived value.
  *
  * Scale notes: single narrow pass for cleaning + scoring (no shuffle);
  * the smart-skip split (J1 anti / J2 inner) shuffles once on
  * repository_id; classification is pure column logic (no collect, no
  * UDF, no network on the correctness path).
  */
object Silver {

  /** Cleaning + standardization (reference :686-734; description via the
    * reference-exact markdown-stripping cleaner,
    * utils/data_transformer.py:286-299). */
  def clean(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("name", trim(regexp_replace(col("name"), "[\\r\\n\\t]+", " ")))
      .withColumn("description",
        graft.functions.TextAnalysis.cleanDescription(col("description")))
      .withColumn("topics",
        org.apache.spark.sql.functions.transform(
          coalesce(col("topics"), array()), t => lower(trim(t))))

  /** Derived metrics + scores for one processing date (reference
    * :723-726 date arithmetic, :748-787 scorecards, :744-791 velocity /
    * health metrics). The reference's `rand()*10` commit-frequency
    * placeholder (:756-758) is replaced by a deterministic md5-derived
    * uniform in [0,10) so results are reproducible; `current_date()` /
    * `current_timestamp()` become the processing-date parameter. */
  def score(df: DataFrame, processingDate: Column): DataFrame =
    df.withColumn("age_days",
        datediff(processingDate, to_date(col("created_at"))))
      .withColumn("days_since_push",
        datediff(processingDate, to_date(col("pushed_at"))))
      .withColumn("is_active", col("days_since_push") <= 365)
      .withColumn("license_category", licenseCategory(col("license_name")))
      .withColumn("activity_score", activityScore(col("days_since_push")))
      .withColumn("momentum_score",
        momentumScore(col("stargazers_count"), col("age_days")))
      .withColumn("quality_score", qualityScore(
        length(col("description")) > 0, size(col("topics")),
        col("stargazers_count"), col("days_since_push")))
      .withColumn("popularity_tier", popularityTier(col("stargazers_count")))
      // star velocity (reference :751-755): stars per day of age
      .withColumn("star_velocity_30d",
        when(col("age_days") > 0,
          col("stargazers_count") / greatest(col("age_days"), lit(1)))
          .otherwise(lit(0.0)))
      // commit frequency (reference :756-758): deterministic stand-in for
      // rand()*10 — first 8 md5 hex chars of the id, scaled to [0,10)
      .withColumn("commit_frequency_30d",
        when(col("is_active"),
          conv(substring(md5(concat(lit("cf|"),
            col("repository_id").cast("string"))), 1, 8), 16, 10)
            .cast("double") / 4294967296.0 * 10.0)
          .otherwise(lit(0.0)))
      // community health (reference :760-777): 20 points per signal
      .withColumn("community_health_score",
        (when(length(col("description")) > 0, 20).otherwise(0)
          + when(col("license_name").isNotNull, 20).otherwise(0)
          + when(size(col("topics")) > 0, 20).otherwise(0)
          + when(col("is_active"), 20).otherwise(0)
          + when(col("size_kb") > 0, 20).otherwise(0)).cast("double"))
      // topic→language distribution (reference :403-445 via :694-697)
      .withColumn("language_distribution",
        langDistribution(col("language"), col("topics")))
      .withColumn("processed_timestamp", processingDate.cast("timestamp"))

  /** Data-quality flags + reject filter (reference :795-814). */
  def qualityGate(df: DataFrame): DataFrame =
    df.withColumn("data_quality_flags",
        filter(array(
          when(col("name").isNull.or(trim(col("name")) === ""), "missing_name"),
          when(col("stargazers_count") < 0, "negative_stars"),
          when(col("repository_id").isNull, "missing_id")),
          f => f.isNotNull))
      .filter(size(col("data_quality_flags")) === 0 ||
        !array_contains(col("data_quality_flags"), "missing_name"))
      .filter(col("stargazers_count") >= 0)

  /** Smart-skip classification (reference :460-494): rows whose existing
    * silver classification is good (conf ≥ 0.8, category not
    * Other/unknown) keep it — only the rest go through the classifier.
    * J1 anti-join + J2 inner join + union, one shuffle each.
    */
  def smartClassify(bronze: DataFrame, existingSilver: Option[DataFrame],
      classifier: Classifier): DataFrame =
    existingSilver match {
      case None => classifier.classify(bronze)
      case Some(silver) =>
        val good = silver.filter(
          col("technology_category") =!= "Other" &&
            col("technology_subcategory") =!= "unknown" &&
            col("classification_confidence") >= 0.8)
          .select("repository_id", "technology_category",
            "technology_subcategory", "classification_confidence")
        val needsLlm = bronze.join(good, Seq("repository_id"), "left_anti")
        val keepExisting = bronze.join(good, Seq("repository_id"), "inner")
        classifier.classify(needsLlm).unionByName(keepExisting)
    }

  /** Full bronze→silver run: clean → smart-classify → score → gate →
    * canonical column list. */
  def transform(bronze: DataFrame, processingDate: String,
      existingSilver: Option[DataFrame] = None,
      classifier: Classifier = RuleClassifier): DataFrame = {
    val cleaned = clean(bronze)
    val classified = smartClassify(cleaned, existingSilver, classifier)
    val scored = score(classified, lit(processingDate).cast("date"))
    qualityGate(scored)
      .withColumn("partition_date", lit(processingDate))
      .select(Schemas.silverColumns.map(col): _*)
  }

  /** Silver MERGE into the existing table (reference :867-920): smart
    * per-column resolution — keep good classifications, refresh
    * everything else. */
  def mergeIntoSilver(existing: DataFrame, fresh: DataFrame): DataFrame =
    Upsert.merge(existing, fresh, Seq("repository_id"),
      smartCases = Map(
        "technology_category" -> Upsert.keepUnlessPlaceholder("Other"),
        "technology_subcategory" -> Upsert.keepUnlessPlaceholder("unknown")))
}
