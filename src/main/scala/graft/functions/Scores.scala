package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar scoring / classification semantics as pure
  * `Column` expressions — UDF-free, codegen-friendly, unit-testable.
  * Each function cites the reference logic it reproduces (paths under
  * /root/reference/src/stacktrend/).
  */
object Scores {

  /** License category from license name substring matching
    * (notebooks/bronze_to_silver_transformation.py:713-720). */
  def licenseCategory(licenseName: Column): Column = {
    val l = lower(coalesce(licenseName, lit("")))
    when(l === "", "none")
      .when(l.contains("mit").or(l.contains("apache")).or(l.contains("bsd")), "permissive")
      .when(l.contains("gpl").or(l.contains("agpl")), "copyleft")
      .otherwise("other")
  }

  /** Tiered activity score from days since last push
    * (utils/data_transformer.py:216-251: 0-30d => 100, 31-90 => 70,
    * 91-365 => 40, older => 10). */
  def activityScore(daysSincePush: Column): Column =
    when(daysSincePush <= 30, 100)
      .when(daysSincePush <= 90, 70)
      .when(daysSincePush <= 365, 40)
      .otherwise(10)

  /** Momentum = stars per day of age, clamped to [0,100]
    * (utils/data_transformer.py:202-214: stars / days_old). */
  def momentumScore(stars: Column, ageDays: Column): Column =
    least(lit(100.0), stars.cast("double") / greatest(ageDays, lit(1)) * 10.0)

  /** Additive quality scorecard in [0,100]
    * (bronze_to_silver_transformation.py:769-782 idiom: when(...,pts)
    * chains + greatest/least clamp). */
  def qualityScore(hasDescription: Column, nTopics: Column, stars: Column,
      daysSincePush: Column): Column =
    greatest(least(
      when(hasDescription, 25).otherwise(0)
        + when(nTopics >= 3, 25).when(nTopics >= 1, 15).otherwise(0)
        + when(stars >= 1000, 30).when(stars >= 100, 20).when(stars >= 10, 10).otherwise(0)
        + when(daysSincePush <= 30, 20).when(daysSincePush <= 180, 10).otherwise(0),
      lit(100)), lit(0))

  /** Health grade A–F from a 0-100 score
    * (personal_repos_silver_to_gold.py:204-210). */
  def healthGrade(score: Column): Column =
    when(score >= 90, "A").when(score >= 75, "B").when(score >= 60, "C")
      .when(score >= 40, "D").otherwise("F")

  /** Lifecycle stage from age and activity
    * (silver_to_gold_analytics.py:199-213). */
  def lifecycleStage(ageDays: Column, activityScr: Column): Column =
    when(ageDays <= 365 && activityScr >= 70, "emerging")
      .when(activityScr >= 70, "growing")
      .when(activityScr >= 40, "mature")
      .otherwise("declining")

  /** Popularity tier from stars (utils/data_transformer.py:253-266). */
  def popularityTier(stars: Column): Column =
    when(stars >= 10000, "S").when(stars >= 1000, "A")
      .when(stars >= 100, "B").when(stars >= 10, "C").otherwise("D")

  /** U1 language-distribution map: primary language gets 70%, the topic
    * languages share the remaining 30% equally; a repo with no topics
    * gives the primary 100% (bronze_to_silver_transformation.py:403-445,
    * rebuilt from `map_from_arrays` + higher-order functions — no UDF).
    * Result values sum to 100.
    */
  def langDistribution(primary: Column, topicLangs: Column): Column = {
    val others = array_distinct(array_remove(coalesce(topicLangs, array()), primary))
    val n = size(others)
    when(n === 0, map_from_arrays(array(primary), array(lit(100.0))))
      .otherwise(map_from_arrays(
        concat(array(primary), others),
        concat(array(lit(70.0)),
          transform(others, _ => lit(30.0) / n.cast("double")))))
  }
}
