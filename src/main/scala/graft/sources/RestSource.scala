package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Driver-side REST ingestion adapter (SURVEY.md §2.1 S1–S3): the
  * reference's paginated GitHub-API collectors
  * (`notebooks/github_data_ingestion.py:92-232`,
  * `personal_repos_ingestion.py:77-236`) generalized into a source
  * trait. The page loop runs on the driver (as in the reference — the
  * API is the bottleneck, not Spark); fetched pages become a
  * `Dataset[String]` that [[JsonIngest]] parses with the explicit
  * schema. At scale the same contract is fulfilled by staging files and
  * reading them directly — the pipeline downstream is identical.
  *
  * [[HttpPageSource]] is the REAL production transport
  * (`java.net.http`: Retry-After rate-limit handling, 5xx backoff,
  * GitHub `items` envelope — reference backoff:
  * `personal_repos_ingestion.py:110-131`), exercised against an
  * in-process HTTP server in HttpTransportSpec; [[FixturePageSource]]
  * stays the deterministic backend for pagination-logic tests.
  */
trait PageSource {
  /** Fetch one page of raw JSON records; empty = pagination done. */
  def fetchPage(page: Int): Seq[String]
}

/** Deterministic fixture-backed source for tests. */
final class FixturePageSource(pages: Seq[Seq[String]]) extends PageSource {
  var calls: Int = 0
  def fetchPage(page: Int): Seq[String] = {
    calls += 1
    if (page < pages.length) pages(page) else Seq.empty
  }
}

object RestSource {

  /** Paginate until an empty page or `maxPages`, dedup by a
    * caller-supplied identity (the reference dedups by repository id
    * across its randomized search queries,
    * `github_data_ingestion.py:199-219`), throttled by `onPage`.
    */
  def collect(source: PageSource, maxPages: Int = 10,
      identity: String => String = s => s,
      onPage: Int => Unit = _ => ()): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      onPage(page)
      val batch = source.fetchPage(page)
      if (batch.isEmpty) done = true
      else batch.foreach { rec => seen.getOrElseUpdate(identity(rec), rec) }
      page += 1
    }
    seen.values.toSeq
  }

  /** Full S1/S2 path: paginate -> dedup -> explicit-schema parse ->
    * bronze frame. */
  def ingest(spark: SparkSession, source: PageSource, partitionDate: String,
      maxPages: Int = 10, identity: String => String = s => s): DataFrame = {
    import spark.implicits._
    val records: Dataset[String] =
      collect(source, maxPages, identity).toDS()
    JsonIngest.fromJson(spark, records, partitionDate)
  }
}
