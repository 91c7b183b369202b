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
      TrainingQueries.all ++ ExtendedOps.all ++ GraphQueries.all ++
      TimeSeriesQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The SURVEY §7.2 end-to-end slice — "top-5 technologies by
    * momentum" (silver_to_gold_analytics.py:346-351): map the `part`
    * table to bronze-repo shape deterministically, run the full
    * bronze→silver→gold pipeline (clean, rule-classify, score, gate,
    * 13-measure rollup), rank by momentum.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val bronzeShaped = DemoBronze.fromPart(spark, "/root/testdata/sf0.001")
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
