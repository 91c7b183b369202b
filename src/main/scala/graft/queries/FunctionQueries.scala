package graft.queries

import graft.Tables
import graft.functions.Scores
import graft.pipeline.{Gold, Silver}
import org.apache.spark.sql.functions._

/** Scalar-function pack exercising the U1 language-distribution map
  * (SURVEY.md §2.10) — built from `map_from_arrays` + higher-order
  * functions, emitted in exploded long format so the oracle can compare
  * it without map-type hashing concerns.
  */
object FunctionQueries {

  private val langs = Seq("en", "de", "es", "fr", "zh")

  val all: Seq[Q] = Seq(
    // U1 (bronze_to_silver_transformation.py:403-445): primary language
    // 70%, topic languages share 30% equally; here each document's
    // "topic languages" are the other four corpus languages.
    Q(
      "u1_langdist",
      (s, d) => {
        val topicLangs = array(langs.map(lit): _*)
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(Scores.langDistribution(col("lang"), topicLangs))
              .as(Seq("dist_lang", "pct")))
          .orderBy("doc_id", "dist_lang")
      },
      Some(s"""
        SELECT doc_id, lang AS dist_lang, CAST(70.0 AS DOUBLE) AS pct
        FROM documents
        UNION ALL
        SELECT doc_id, l AS dist_lang, CAST(7.5 AS DOUBLE) AS pct
        FROM documents,
             UNNEST([${langs.map(l => s"'$l'").mkString(", ")}]) AS u(l)
        WHERE l != lang
        ORDER BY doc_id, dist_lang""")),

    // ----------------------------------------------------------------
    // THE PIPELINE ORACLE: the full bronze→silver→gold computation
    // (DemoBronze mapping → Silver.transform: clean / rule-classify /
    // score / gate → Gold.techMetrics 13-measure rollup + lifecycle)
    // restated declaratively in SQL. Every scalar the pipeline derives
    // (license category, activity/momentum/quality scores, is_active,
    // classification) is re-derived independently by the oracle engine,
    // so a regression anywhere in the medallion path breaks the hash.
    Q(
      "g1_gold_pipeline",
      (s, d) =>
        Gold.techMetrics(
          Silver.transform(DemoBronze.fromPart(s, d), "2024-06-15"))
          .orderBy("technology_category"),
      Some {
        def dsum(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
        def davg(x: String) = s"${dsum(x)} / COUNT($x)"
        s"""
        WITH b AS (
          SELECT p_partkey AS id,
                 CAST(floor(p_retailprice * 10) AS BIGINT) AS stars,
                 CAST(p_size AS BIGINT) AS forks,
                 CASE WHEN p_partkey % 3 = 0 THEN 'permissive'
                      WHEN p_partkey % 3 = 1 THEN 'copyleft'
                      ELSE 'none' END AS license_category,
                 CASE WHEN p_partkey % 4 = 0 THEN 'Data Engineering'
                      ELSE 'Systems' END AS technology_category,
                 CASE WHEN p_partkey % 5 = 0 THEN 531 ELSE 14 END AS days_since_push,
                 896 AS age_days
          FROM part),
        s AS (
          SELECT *,
                 days_since_push <= 365 AS is_active,
                 LEAST(100.0, CAST(stars AS DOUBLE) / GREATEST(age_days, 1) * 10.0)
                   AS momentum_score,
                 GREATEST(LEAST(
                   25 + 15
                   + (CASE WHEN stars >= 1000 THEN 30 WHEN stars >= 100 THEN 20
                           WHEN stars >= 10 THEN 10 ELSE 0 END)
                   + (CASE WHEN days_since_push <= 30 THEN 20
                           WHEN days_since_push <= 180 THEN 10 ELSE 0 END),
                   100), 0) AS quality_score
          FROM b)
        SELECT technology_category,
               COUNT(*) AS repository_count,
               ${dsum("stars")} AS total_stars,
               ${dsum("forks")} AS total_forks,
               ${davg("stars")} AS avg_stars,
               ${davg("quality_score")} AS avg_quality_score,
               ${davg("momentum_score")} AS avg_momentum,
               COUNT(CASE WHEN is_active THEN 1 END) AS active_repository_count,
               COUNT(DISTINCT license_category) AS license_diversity,
               ${davg("age_days")} AS avg_age_days,
               CASE WHEN ${davg("age_days")} <= 365
                         AND ${davg("momentum_score")} * 10 >= 70 THEN 'emerging'
                    WHEN ${davg("momentum_score")} * 10 >= 70 THEN 'growing'
                    WHEN ${davg("momentum_score")} * 10 >= 40 THEN 'mature'
                    ELSE 'declining' END AS lifecycle_stage
        FROM s
        GROUP BY technology_category
        ORDER BY technology_category"""
      })
  )
}
