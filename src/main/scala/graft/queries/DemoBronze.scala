package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic part→bronze-repo mapping shared by the flagship
  * `entry()` and the pipeline oracle query `g1_gold_pipeline`: every
  * derived attribute is a pure function of `p_partkey`/part columns, so
  * an independent engine can re-derive the whole medallion pipeline.
  * `floor()` (not a bare cast) keeps double→long conversion identical
  * across engines — Spark casts truncate, DuckDB casts round.
  */
object DemoBronze {
  def fromPart(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    part.select(
      col("p_partkey").as("repository_id"),
      col("p_name").as("name"),
      concat(col("p_brand"), lit("/"), col("p_name")).as("full_name"),
      concat(lit("A "), col("p_type"), lit(" part")).as("description"),
      col("p_brand").as("owner_login"),
      when(col("p_partkey") % 6 === 0, "Organization")
        .otherwise("User").as("owner_type"),
      when(col("p_partkey") % 3 === 0, "MIT License")
        .when(col("p_partkey") % 3 === 1, "GPL v3")
        .otherwise(null).as("license_name"),
      floor(col("p_retailprice") * 10).cast("long").as("stargazers_count"),
      col("p_size").cast("long").as("forks_count"),
      floor(col("p_retailprice") * 10).cast("long").as("watchers_count"),
      lit(0L).as("open_issues_count"),
      col("p_size").cast("long").as("size_kb"),
      lit("main").as("default_branch"),
      when(col("p_partkey") % 2 === 0, "Scala").otherwise("Rust").as("language"),
      array(
        when(col("p_partkey") % 4 === 0, "spark").otherwise("kernel"),
        lower(col("p_type"))).as("topics"),
      to_timestamp(lit("2022-01-01 00:00:00")).as("created_at"),
      to_timestamp(lit("2024-05-01 00:00:00")).as("updated_at"),
      to_timestamp(
        when(col("p_partkey") % 5 === 0, "2023-01-01 00:00:00")
          .otherwise("2024-06-01 00:00:00")).as("pushed_at"),
      lit(true).as("has_wiki"), lit(false).as("has_pages"),
      lit(false).as("archived"), lit(false).as("disabled"),
      to_timestamp(lit("2024-06-15 00:00:00")).as("ingestion_timestamp"),
      lit("2024-06-15").as("partition_date"))
  }
}
