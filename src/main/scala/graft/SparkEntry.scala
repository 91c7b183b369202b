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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by region/nation: broadcast-dim join chain + exact rollup
    * (SURVEY.md §2.4 J2/J5, §2.5 A1). */
  def entry(spark: SparkSession): DataFrame = {
    val q = packs.find(_.name == "j2_join_enrich").get
    q.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.collect { case Q(n, _, Some(sql)) => n -> sql.trim }.toMap
}
