package graft.pipeline

import graft.sources.JsonIngest
import graft.storage.ParquetCatalog
import org.apache.spark.sql.{Dataset, SparkSession}

/** Full medallion orchestration (SURVEY.md §3.1 topology): the
  * reference's Data-Factory pipeline chain — ingest → bronze MERGE →
  * bronze→silver (smart classify + smart merge) → silver→gold (seven
  * table overwrite) — as one idempotent job over a [[ParquetCatalog]].
  * Scheduling stays external (the reference's 6-hour trigger is a cron
  * concern, not engine semantics); each `run` is one micro-batch.
  */
final class Runner(spark: SparkSession, catalog: ParquetCatalog,
    classifier: Classifier = RuleClassifier) {

  /** One pipeline run for a batch of API-shaped JSON. Returns the table
    * names written. */
  def run(json: Dataset[String], processingDate: String): Seq[String] = {
    // ingest -> bronze upsert (K2, github_data_ingestion.py:349-383)
    val bronzeBatch = JsonIngest.fromJson(spark, json, processingDate)
    catalog.upsert("bronze_repos", bronzeBatch, Seq("repository_id"),
      partitionBy = Seq("partition_date"))

    // bronze -> silver with smart-skip + smart merge (K3)
    val bronze = catalog.read("bronze_repos")
    val existingSilver =
      if (catalog.exists("silver_repos")) Some(catalog.read("silver_repos"))
      else None
    val fresh = Silver.transform(bronze, processingDate, existingSilver, classifier)
    existingSilver match {
      case None => catalog.overwrite("silver_repos", fresh,
        Seq("partition_date", "technology_category"))
      case Some(existing) =>
        catalog.overwrite("silver_repos",
          Silver.mergeIntoSilver(existing, fresh),
          Seq("partition_date", "technology_category"))
    }

    // silver -> gold: seven-table overwrite (K1)
    val silver = catalog.read("silver_repos")
    val written = Gold.allTables(silver).map { case (name, df) =>
      val tableName = s"gold_$name"
      catalog.overwrite(tableName, df)
      tableName
    }
    Seq("bronze_repos", "silver_repos") ++ written
  }
}
