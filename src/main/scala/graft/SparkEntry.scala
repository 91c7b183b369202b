package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query pack. Each pack is a `Seq[Q]` of
  * (name, spark-query, optional DuckDB oracle SQL); names and aliased
  * column names are identical between the Spark result and the oracle so
  * the driver's sorted-column hash compare lines up.
  */
object SparkEntry {

  private def packs: Seq[Q] =
    Relational.all ++ ExtensionQueries.all ++ VectorQueries.all ++
      MergeQueries.all ++ FunctionQueries.all ++ StreamingQueries.all ++
      TrainingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The SURVEY §7.2 end-to-end slice — "top-5 technologies by
    * momentum" (silver_to_gold_analytics.py:346-351): map the `part`
    * table to bronze-repo shape deterministically, run the full
    * bronze→silver→gold pipeline (clean, rule-classify, score, gate,
    * 13-measure rollup), rank by momentum.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val bronzeShaped = part.select(
      col("p_partkey").as("repository_id"),
      col("p_name").as("name"),
      concat(col("p_brand"), lit("/"), col("p_name")).as("full_name"),
      concat(lit("A "), col("p_type"), lit(" part")).as("description"),
      col("p_brand").as("owner_login"),
      lit(null).cast("string").as("owner_type"),
      when(col("p_partkey") % 3 === 0, "MIT License")
        .when(col("p_partkey") % 3 === 1, "GPL v3")
        .otherwise(null).as("license_name"),
      (col("p_retailprice") * 10).cast("long").as("stargazers_count"),
      col("p_size").cast("long").as("forks_count"),
      (col("p_retailprice") * 10).cast("long").as("watchers_count"),
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
    val silver = graft.pipeline.Silver.transform(bronzeShaped, "2024-06-15")
    graft.pipeline.Gold.techMetrics(silver)
      .orderBy(col("avg_momentum").desc, col("technology_category"))
      .limit(5)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.collect { case Q(n, _, Some(sql)) => n -> sql.trim }.toMap
}
