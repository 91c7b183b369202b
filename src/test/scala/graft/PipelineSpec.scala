package graft

import graft.pipeline.{Gold, RuleClassifier, Silver}
import graft.sources.JsonIngest
import org.apache.spark.sql.functions._

/** End-to-end medallion pipeline on an in-code bronze fixture:
  * ingest → silver → gold, plus smart-merge rerun semantics. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureJson = Seq(
    """{"id":1,"name":"sparkly","full_name":"org/sparkly","description":"ETL engine","owner":{"login":"org"},"license":{"name":"Apache License 2.0"},"stargazers_count":5000,"forks_count":400,"watchers_count":5000,"size":1024,"language":"Scala","topics":["spark","etl"],"created_at":"2020-01-01T00:00:00Z","updated_at":"2024-05-01T00:00:00Z","pushed_at":"2024-05-20T00:00:00Z","has_wiki":true,"archived":false}""",
    """{"id":2,"name":"webby","full_name":"me/webby","description":"frontend toolkit","owner":{"login":"me"},"license":{"name":"MIT License"},"stargazers_count":150,"forks_count":10,"watchers_count":150,"size":90,"language":"TypeScript","topics":["react","frontend"],"created_at":"2023-06-01T00:00:00Z","updated_at":"2024-06-01T00:00:00Z","pushed_at":"2024-06-01T00:00:00Z","has_wiki":false,"archived":false}""",
    """{"id":3,"name":"mystery","full_name":"x/mystery","description":null,"owner":{"login":"x"},"license":null,"stargazers_count":3,"forks_count":0,"watchers_count":3,"size":5,"language":"COBOL","topics":[],"created_at":"2010-01-01T00:00:00Z","updated_at":"2015-01-01T00:00:00Z","pushed_at":"2015-01-01T00:00:00Z","has_wiki":false,"archived":true}""",
    """{"id":4,"name":"","full_name":"bad/empty","description":"no name","owner":{"login":"bad"},"license":null,"stargazers_count":1,"forks_count":0,"watchers_count":1,"size":1,"language":null,"topics":[],"created_at":"2020-01-01T00:00:00Z","updated_at":"2020-01-01T00:00:00Z","pushed_at":"2020-01-01T00:00:00Z","has_wiki":false,"archived":false}"""
  )

  private def bronze =
    JsonIngest.fromJson(spark, fixtureJson.toDS(), "2024-06-15")

  test("ingest flattens nested fields with explicit schema") {
    val b = bronze
    assert(b.count() === 4)
    val r = b.filter($"repository_id" === 1).head()
    assert(r.getAs[String]("owner_login") === "org")
    assert(r.getAs[String]("license_name") === "Apache License 2.0")
    assert(r.getAs[Seq[String]]("topics") === Seq("spark", "etl"))
  }

  test("silver transform classifies, scores, and rejects bad rows") {
    val silver = Silver.transform(bronze, "2024-06-15")
    val byId = silver.collect().map(r => r.getAs[Long]("repository_id") -> r).toMap
    assert(!byId.contains(4L), "missing_name row must be rejected")

    val sparkly = byId(1L)
    assert(sparkly.getAs[String]("technology_category") === "Data Engineering")
    assert(sparkly.getAs[Double]("classification_confidence") === 0.9)
    assert(sparkly.getAs[String]("license_category") === "permissive")
    assert(sparkly.getAs[Boolean]("is_active"))

    val webby = byId(2L)
    assert(webby.getAs[String]("technology_category") === "Web Development")

    val mystery = byId(3L)
    assert(mystery.getAs[String]("technology_category") === "Other")
    assert(mystery.getAs[Double]("classification_confidence") === 0.3)
    assert(!mystery.getAs[Boolean]("is_active"))
  }

  test("smart-skip keeps existing good classifications on rerun") {
    val first = Silver.transform(bronze, "2024-06-15")
    // simulate a later run where repo 1 already has a good classification
    // but with a *different* category — it must be preserved (not
    // re-derived), while repo 3's low-confidence 'Other' is re-classified.
    val existing = first
      .withColumn("technology_category",
        when($"repository_id" === 1, "AI/ML").otherwise($"technology_category"))
    val second = Silver.transform(bronze, "2024-06-16", Some(existing))
    val byId = second.collect().map(r => r.getAs[Long]("repository_id") -> r).toMap
    assert(byId(1L).getAs[String]("technology_category") === "AI/ML")
    assert(byId(3L).getAs[String]("technology_category") === "Other")
  }

  test("silver merge preserves classifications and refreshes metrics") {
    val v1 = Silver.transform(bronze, "2024-06-15")
    val laterBronze = bronze.withColumn("stargazers_count",
      $"stargazers_count" + 1000)
    val v2 = Silver.transform(laterBronze, "2024-06-16")
      .withColumn("technology_category", lit("Other")) // degraded rerun
    val merged = Silver.mergeIntoSilver(v1, v2)
    val r = merged.filter($"repository_id" === 1).head()
    assert(r.getAs[String]("technology_category") === "Data Engineering",
      "good category survives a degraded source")
    assert(r.getAs[Long]("stargazers_count") === 6000L,
      "metrics always refresh")
  }

  test("gold tables compute expected rollups") {
    val silver = Silver.transform(bronze, "2024-06-15")
    val tm = Gold.techMetrics(silver).collect()
      .map(r => r.getAs[String]("technology_category") -> r).toMap
    assert(tm("Data Engineering").getAs[Long]("repository_count") === 1L)
    assert(tm("Data Engineering").getAs[Double]("total_stars") === 5000.0)

    val pulse = Gold.marketPulse(silver).head()
    assert(pulse.getAs[Long]("total_repositories") === 3L)
    assert(pulse.getAs[Double]("total_stars") === 5153.0)

    val ranks = Gold.repoRankings(silver).collect()
    assert(ranks.forall(_.getAs[Int]("category_rank") === 1),
      "each category has one repo => all rank 1")

    val trend = Gold.dailyTrend(silver).collect()
    assert(math.abs(trend.map(_.getAs[Double]("star_share")).sum - 1.0) <= 1e-9)
  }
}
