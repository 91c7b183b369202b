package graft.model

import org.apache.spark.sql.types._

/** Frozen layer schemas (SURVEY.md §1.3): the medallion layer contracts
  * from the reference's dataclass models
  * (`src/stacktrend/data/medallion_architecture.py:41-148`) and the
  * notebooks' canonical select lists
  * (`bronze_to_silver_transformation.py:822-853`,
  * `silver_to_gold_analytics.py:270-311`), re-expressed as `StructType`
  * constants validated on read.
  */
object Schemas {

  /** Raw GitHub-API-shaped ingest payload (nested owner/license —
    * `notebooks/personal_repos_ingestion.py:244-265`). */
  val apiRepo: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("full_name", StringType),
    StructField("description", StringType),
    StructField("owner", StructType(Seq(
      StructField("login", StringType),
      StructField("type", StringType)))),
    StructField("license", StructType(Seq(StructField("name", StringType)))),
    StructField("stargazers_count", LongType),
    StructField("forks_count", LongType),
    StructField("watchers_count", LongType),
    StructField("open_issues_count", LongType),
    StructField("size", LongType),
    StructField("default_branch", StringType),
    StructField("language", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("pushed_at", StringType),
    StructField("has_wiki", BooleanType),
    StructField("has_pages", BooleanType),
    StructField("archived", BooleanType),
    StructField("disabled", BooleanType)))

  /** Bronze layer: flattened, typed, partition-dated
    * (medallion_architecture.py:41-74). */
  val bronze: StructType = StructType(Seq(
    StructField("repository_id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("full_name", StringType),
    StructField("description", StringType),
    StructField("owner_login", StringType),
    StructField("owner_type", StringType),
    StructField("license_name", StringType),
    StructField("stargazers_count", LongType),
    StructField("forks_count", LongType),
    StructField("watchers_count", LongType),
    StructField("open_issues_count", LongType),
    StructField("size_kb", LongType),
    StructField("default_branch", StringType),
    StructField("language", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("pushed_at", TimestampType),
    StructField("has_wiki", BooleanType),
    StructField("has_pages", BooleanType),
    StructField("archived", BooleanType),
    StructField("disabled", BooleanType),
    StructField("ingestion_timestamp", TimestampType),
    StructField("partition_date", StringType)))

  /** Silver layer columns in canonical order
    * (bronze_to_silver_transformation.py:822-853 select list: raw
    * timestamps, owner_type, open_issues_count, language_distribution,
    * the 30d velocity/frequency metrics, community health, and the
    * processing timestamp all pass through to silver). */
  val silverColumns: Seq[String] = Seq(
    "repository_id", "name", "full_name", "description", "owner_login",
    "owner_type", "created_at", "updated_at", "pushed_at",
    "stargazers_count", "forks_count", "watchers_count",
    "open_issues_count", "size_kb", "language", "language_distribution",
    "topics", "license_category", "age_days", "days_since_push",
    "is_active", "activity_score", "momentum_score", "quality_score",
    "popularity_tier", "star_velocity_30d", "commit_frequency_30d",
    "community_health_score", "technology_category",
    "technology_subcategory", "classification_confidence",
    "data_quality_flags", "processed_timestamp", "partition_date")
}
