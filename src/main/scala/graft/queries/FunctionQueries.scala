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

  /** DuckDB mirror of [[Scores.langDistribution]] as a CTE chain ending
    * in `ld(<id>, dist_lang, pct)`. `baseSelect` must yield
    * (<id>, prim, topics). Duplicate (topic, dict-entry) matches count
    * in the denominator, exact-match primary is excluded from the topic
    * shares, Unknown backfills, and the total is 70 + per·n (one
    * multiply) — identical double construction to the Spark side. */
  private def langDistSql(baseSelect: String, id: String): String = {
    val dictVals = Scores.programmingLanguages
      .map { case (k, v) => s"('$k', '$v')" }.mkString(", ")
    s"""dict(k, v) AS (VALUES $dictVals),
        base AS ($baseSelect),
        pv AS (
          SELECT $id, prim,
                 (prim IS NOT NULL AND trim(prim) <> ''
                  AND lower(prim) NOT IN ('null', 'none')) AS pvalid
          FROM base),
        tl AS (
          SELECT $id, v FROM base, UNNEST(topics) AS ut(t), dict
          WHERE contains(lower(t), k)),
        cnt AS (SELECT $id, COUNT(*) AS n_t FROM tl GROUP BY $id),
        oth AS (
          SELECT DISTINCT tl.$id, v FROM tl JOIN pv USING ($id)
          WHERE NOT (pvalid AND v = prim)),
        no_ AS (SELECT $id, COUNT(*) AS n_o FROM oth GROUP BY $id),
        tot AS (
          SELECT pv.$id,
                 CASE WHEN pvalid THEN CAST(70.0 AS DOUBLE)
                        + COALESCE((CAST(30.0 AS DOUBLE) / cnt.n_t) * no_.n_o,
                                   CAST(0.0 AS DOUBLE))
                      ELSE COALESCE((CAST(100.0 AS DOUBLE) / cnt.n_t) * no_.n_o,
                                    CAST(100.0 AS DOUBLE)) END AS total
          FROM pv LEFT JOIN cnt USING ($id) LEFT JOIN no_ USING ($id)),
        lrows AS (
          SELECT $id, prim AS dist_lang, CAST(70.0 AS DOUBLE) AS raw
          FROM pv WHERE pvalid
          UNION ALL
          SELECT o.$id, o.v AS dist_lang,
                 CAST(CASE WHEN pvalid THEN 30.0 ELSE 100.0 END AS DOUBLE)
                   / cnt.n_t AS raw
          FROM oth o JOIN pv USING ($id) JOIN cnt USING ($id)
          UNION ALL
          SELECT pv.$id, 'Unknown' AS dist_lang, CAST(100.0 AS DOUBLE) AS raw
          FROM pv LEFT JOIN cnt USING ($id)
          WHERE NOT pvalid AND cnt.$id IS NULL),
        ld AS (
          SELECT r.$id, r.dist_lang, round(r.raw / t.total * 100.0, 1) AS pct
          FROM lrows r JOIN tot t USING ($id))"""
  }

  /** u1/u2 shared deterministic (prim, topics) derivation. */
  private val u1BaseSql = """
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0 THEN 'Python'
                      WHEN doc_id % 4 = 1 THEN ''
                      WHEN doc_id % 4 = 2 THEN 'null' ELSE 'Go' END AS prim,
                 [CASE WHEN doc_id % 5 = 0 THEN 'python3'
                       WHEN doc_id % 5 = 1 THEN 'typescript-starter'
                       WHEN doc_id % 5 = 2 THEN 'web'
                       WHEN doc_id % 5 = 3 THEN 'golang' ELSE 'c++-lib' END,
                  CASE WHEN doc_id % 3 = 0 THEN 'docker'
                       WHEN doc_id % 3 = 1 THEN 'bash' ELSE 'ml' END] AS topics
          FROM documents"""

  val all: Seq[Q] = Seq(
    // U1 (bronze_to_silver_transformation.py:403-445), reference-exact:
    // the 23-entry substring lookup (with its quirks — 'r' matches any
    // topic containing the letter, duplicate appends inflate the
    // denominator), 70/30 primary split, '' / 'null' / 'none' primaries
    // rejected, Unknown fallback, normalize-to-100 + round(1). Primary
    // and topics are derived deterministically from doc_id to hit every
    // path: valid/invalid primaries, multi-match topics, a topic set
    // matching nothing (→ Unknown), and a topic language equal to the
    // primary (skipped but still counted in the denominator).
    Q(
      "u1_langdist",
      (s, d) => {
        val m4 = col("doc_id") % 4
        val m5 = col("doc_id") % 5
        val m3 = col("doc_id") % 3
        val prim = when(m4 === 0, "Python").when(m4 === 1, "")
          .when(m4 === 2, "null").otherwise("Go")
        val t1 = when(m5 === 0, "python3").when(m5 === 1, "typescript-starter")
          .when(m5 === 2, "web").when(m5 === 3, "golang").otherwise("c++-lib")
        val t2 = when(m3 === 0, "docker").when(m3 === 1, "bash").otherwise("ml")
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(Scores.langDistribution(prim, array(t1, t2)))
              .as(Seq("dist_lang", "pct")))
          .orderBy("doc_id", "dist_lang")
      },
      Some(s"""
        WITH ${langDistSql(u1BaseSql, "doc_id")}
        SELECT doc_id, dist_lang, pct FROM ld
        ORDER BY doc_id, dist_lang""")),

    // ----------------------------------------------------------------
    // map_filter over the language-distribution map (§2.8 map suite):
    // keep only languages holding >= 10% — the map-valued HOF the
    // reference's key-value distributions imply, over u1's inputs.
    Q(
      "u2_langdist_major",
      (s, d) => {
        val m4 = col("doc_id") % 4
        val m5 = col("doc_id") % 5
        val m3 = col("doc_id") % 3
        val prim = when(m4 === 0, "Python").when(m4 === 1, "")
          .when(m4 === 2, "null").otherwise("Go")
        val t1 = when(m5 === 0, "python3").when(m5 === 1, "typescript-starter")
          .when(m5 === 2, "web").when(m5 === 3, "golang").otherwise("c++-lib")
        val t2 = when(m3 === 0, "docker").when(m3 === 1, "bash").otherwise("ml")
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(map_filter(
              Scores.langDistribution(prim, array(t1, t2)),
              (_, v) => v >= 10.0)).as(Seq("dist_lang", "pct")))
          .orderBy("doc_id", "dist_lang")
      },
      Some(s"""
        WITH ${langDistSql(u1BaseSql, "doc_id")}
        SELECT doc_id, dist_lang, pct FROM ld
        WHERE pct >= 10.0
        ORDER BY doc_id, dist_lang""")),

    // ----------------------------------------------------------------
    // Silver schema parity (bronze_to_silver_transformation.py:822-853):
    // the columns VERDICT r2 flagged as missing — owner_type, raw
    // timestamps, open_issues_count, star_velocity_30d, the
    // deterministic commit_frequency_30d, community_health_score,
    // processed_timestamp, and the exploded language_distribution — all
    // re-derived independently by the oracle over the same part-shaped
    // bronze.
    Q(
      "g2_silver_schema",
      (s, d) => {
        val silver = Silver.transform(DemoBronze.fromPart(s, d), "2024-06-15")
        silver.select(
          col("repository_id"), col("owner_type"),
          date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss").as("created_ts"),
          date_format(col("pushed_at"), "yyyy-MM-dd HH:mm:ss").as("pushed_ts"),
          col("open_issues_count"), col("star_velocity_30d"),
          col("commit_frequency_30d"), col("community_health_score"),
          date_format(col("processed_timestamp"), "yyyy-MM-dd HH:mm:ss")
            .as("processed_ts"),
          explode(col("language_distribution")).as(Seq("dist_lang", "pct")))
          .orderBy("repository_id", "dist_lang")
      },
      Some {
        val cfv = (1 to 8).map(p =>
          s"(strpos('0123456789abcdef', substr(md5('cf|' || CAST(repository_id AS VARCHAR)), $p, 1)) - 1) * ${1L << (4 * (8 - p))}")
          .mkString(" + ")
        s"""
        WITH ${langDistSql("""
          SELECT p_partkey AS repository_id,
                 CASE WHEN p_partkey % 2 = 0 THEN 'Scala' ELSE 'Rust' END AS prim,
                 [CASE WHEN p_partkey % 4 = 0 THEN 'spark' ELSE 'kernel' END,
                  lower(p_type)] AS topics
          FROM part""", "repository_id")},
        feat AS (
          SELECT p_partkey AS repository_id,
                 CASE WHEN p_partkey % 6 = 0 THEN 'Organization' ELSE 'User' END
                   AS owner_type,
                 '2022-01-01 00:00:00' AS created_ts,
                 CASE WHEN p_partkey % 5 = 0 THEN '2023-01-01 00:00:00'
                      ELSE '2024-06-01 00:00:00' END AS pushed_ts,
                 CAST(0 AS BIGINT) AS open_issues_count,
                 CAST(floor(p_retailprice * 10) AS BIGINT) / 896
                   AS star_velocity_30d,
                 CASE WHEN p_partkey % 5 = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE ($cfv) / 4294967296.0 * 10.0 END
                   AS commit_frequency_30d,
                 CAST(20 + (CASE WHEN p_partkey % 3 IN (0, 1) THEN 20 ELSE 0 END)
                      + 20
                      + (CASE WHEN p_partkey % 5 = 0 THEN 0 ELSE 20 END)
                      + (CASE WHEN p_size > 0 THEN 20 ELSE 0 END) AS DOUBLE)
                   AS community_health_score,
                 '2024-06-15 00:00:00' AS processed_ts
          FROM part)
        SELECT f.repository_id, f.owner_type, f.created_ts, f.pushed_ts,
               f.open_issues_count, f.star_velocity_30d,
               f.commit_frequency_30d, f.community_health_score,
               f.processed_ts, ld.dist_lang, ld.pct
        FROM feat f JOIN ld ON ld.repository_id = f.repository_id
        ORDER BY f.repository_id, ld.dist_lang"""
      }),

    // ----------------------------------------------------------------
    // Personal-portfolio overview (personal_repos_silver_to_gold.py:
    // 101-149): the one-row summary with top-5 arrays and diversity
    // ratios — computed as single-pass aggregates where the reference
    // collect()s driver-side. The oracle re-derives every input scalar
    // (classification, quality score, is_active) independently. The
    // library API keeps the top-5 lists as real arrays; the gate view
    // CSV-joins them (the gate's row hash cannot sort array cells).
    Q(
      "g3_portfolio_overview",
      (s, d) =>
        Gold.portfolioOverview(
          Silver.transform(DemoBronze.fromPart(s, d), "2024-06-15"),
          "2024-06-15")
          .withColumn("primary_technologies",
            concat_ws(",", col("primary_technologies")))
          .withColumn("primary_languages",
            concat_ws(",", col("primary_languages"))),
      Some {
        def dsum(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
        s"""
        WITH b AS (
          SELECT p_partkey AS id,
                 CAST(floor(p_retailprice * 10) AS BIGINT) AS stars,
                 CAST(p_size AS BIGINT) AS forks,
                 CAST(p_size AS BIGINT) AS size_kb,
                 CASE WHEN p_partkey % 4 = 0 THEN 'Data Engineering'
                      ELSE 'Systems' END AS cat,
                 CASE WHEN p_partkey % 2 = 0 THEN 'Scala' ELSE 'Rust' END AS lang,
                 CASE WHEN p_partkey % 5 = 0 THEN 531 ELSE 14 END AS days_since_push
          FROM part),
        s AS (
          SELECT *, days_since_push <= 365 AS is_active,
                 GREATEST(LEAST(25 + 15
                   + (CASE WHEN stars >= 1000 THEN 30 WHEN stars >= 100 THEN 20
                           WHEN stars >= 10 THEN 10 ELSE 0 END)
                   + (CASE WHEN days_since_push <= 30 THEN 20
                           WHEN days_since_push <= 180 THEN 10 ELSE 0 END),
                   100), 0) AS quality_score
          FROM b),
        base AS (
          SELECT COUNT(*) AS total_repositories,
                 ${dsum("stars")} AS total_stars,
                 ${dsum("forks")} AS total_forks,
                 COUNT(CASE WHEN is_active THEN 1 END) AS active_repositories,
                 ${dsum("quality_score")} / COUNT(quality_score) AS avg_quality_score,
                 ${dsum("CAST(size_kb AS DOUBLE) / 1024.0")} AS total_size_mb
          FROM s),
        tc AS (SELECT cat, COUNT(*) AS n FROM s GROUP BY cat),
        tech AS (SELECT list(cat ORDER BY n DESC, cat)[1:5] AS primary_technologies,
                        LEAST(COUNT(*), 5) AS tn FROM tc),
        lc AS (SELECT lang, COUNT(*) AS n FROM s GROUP BY lang),
        langs AS (SELECT list(lang ORDER BY n DESC, lang)[1:5] AS primary_languages,
                         LEAST(COUNT(*), 5) AS ln FROM lc)
        SELECT total_repositories, total_stars, total_forks,
               active_repositories, avg_quality_score, total_size_mb,
               array_to_string(primary_technologies, ',') AS primary_technologies,
               array_to_string(primary_languages, ',') AS primary_languages,
               (tn / GREATEST(total_repositories, 1)
                 + ln / GREATEST(total_repositories, 1)) / 2.0
                 AS portfolio_diversity_score,
               CASE WHEN active_repositories / total_repositories >= 0.7 THEN 'high'
                    WHEN active_repositories / total_repositories >= 0.3 THEN 'medium'
                    ELSE 'low' END AS activity_level,
               '2024-06-15' AS measurement_date
        FROM base, tech, langs"""
      }),

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
