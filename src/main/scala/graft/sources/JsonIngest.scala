package graft.sources

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** JSON → bronze ingestion (SURVEY.md §2.1 S4/S5, §2.3 P2): parse
  * API-shaped JSON with the explicit [[Schemas.apiRepo]] schema (no
  * inference — a 100 TB ingest cannot afford a schema-inference
  * pre-pass), flatten nested `owner.login` / `license.name`, parse ISO
  * timestamps. Reference: `notebooks/github_data_ingestion.py:243-322`,
  * `personal_repos_ingestion.py:244-287`.
  */
object JsonIngest {

  /** Parse a dataset of JSON strings into typed bronze rows. The
    * ingestion timestamp is a parameter, not `current_timestamp()` —
    * reruns are reproducible (SURVEY.md §7.4 nondeterminism note). */
  def fromJson(spark: SparkSession, json: Dataset[String],
      partitionDate: String): DataFrame =
    toBronze(spark.read.schema(Schemas.apiRepo).json(json), partitionDate)

  /** Flatten + type an API-shaped frame into the bronze layout
    * (FIXTURES.md A1). */
  def toBronze(api: DataFrame, partitionDate: String): DataFrame =
    api.select(
      col("id").as("repository_id"),
      col("name"),
      col("full_name"),
      col("description"),
      col("owner.login").as("owner_login"),
      col("owner.type").as("owner_type"),
      col("license.name").as("license_name"),
      col("stargazers_count"),
      col("forks_count"),
      col("watchers_count"),
      col("open_issues_count"),
      col("size").as("size_kb"),
      col("default_branch"),
      col("language"),
      col("topics"),
      to_timestamp(col("created_at")).as("created_at"),
      to_timestamp(col("updated_at")).as("updated_at"),
      to_timestamp(col("pushed_at")).as("pushed_at"),
      col("has_wiki"),
      col("has_pages"),
      col("archived"),
      col("disabled"),
      to_timestamp(lit(s"$partitionDate 00:00:00")).as("ingestion_timestamp"),
      lit(partitionDate).as("partition_date"))
      .filter(col("repository_id").isNotNull)
}
