package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Technology classification stage (SURVEY.md §2.11). The reference
  * calls Azure OpenAI per batch (`utils/llm_classifier.py:150-196`);
  * its prompt's own indicator rules (`utils/llm_classifier.py:87-110`)
  * are the deterministic spec, re-expressed here as a keyword
  * broadcast-join — which also replaces the reference's collect()+UDF
  * re-attach (U2–U7) with one distributed join.
  */
trait Classifier {
  /** Adds `technology_category`, `technology_subcategory`,
    * `classification_confidence` to a frame with `topics` + `language`. */
  def classify(df: DataFrame): DataFrame
}

/** Deterministic rule-based classifier. Priority-ordered keyword match
  * over normalized topics, falling back to the primary language.
  * Pure `Column` logic — stays in whole-stage codegen, no network, no
  * UDF, reproducible at any scale.
  */
object RuleClassifier extends Classifier {

  /** (category, subcategory, topic keywords) in priority order —
    * from the prompt's indicator rules, llm_classifier.py:87-110. */
  val rules: Seq[(String, String, Seq[String])] = Seq(
    ("AI/ML", "machine-learning",
      Seq("machine-learning", "deep-learning", "llm", "ai", "neural-network", "nlp")),
    ("Data Engineering", "pipelines",
      Seq("spark", "etl", "data-engineering", "airflow", "kafka", "lakehouse")),
    ("DevOps", "infrastructure",
      Seq("kubernetes", "docker", "terraform", "ci-cd", "devops", "monitoring")),
    ("Web Development", "frontend",
      Seq("react", "vue", "frontend", "javascript", "css", "web")),
    ("Systems", "low-level",
      Seq("rust", "kernel", "embedded", "compiler", "os", "systems")))

  private val langFallback: Map[String, String] = Map(
    "Python" -> "AI/ML", "Scala" -> "Data Engineering", "Go" -> "DevOps",
    "TypeScript" -> "Web Development", "JavaScript" -> "Web Development",
    "Rust" -> "Systems", "C" -> "Systems", "C++" -> "Systems")

  def classify(df: DataFrame): DataFrame = {
    val topics = coalesce(col("topics"), array())
    val byTopic = rules.foldRight(lit(null).cast("string")) {
      case ((cat, _, kws), acc) =>
        when(exists(topics, t => lower(t).isin(kws: _*)), cat).otherwise(acc)
    }
    val bySub = rules.foldRight(lit("unknown")) {
      case ((_, sub, kws), acc) =>
        when(exists(topics, t => lower(t).isin(kws: _*)), sub).otherwise(acc)
    }
    val byLang = langFallback.foldRight(lit(null).cast("string")) {
      case ((l, cat), acc) => when(col("language") === l, cat).otherwise(acc)
    }
    df.withColumn("technology_category",
        coalesce(byTopic, byLang, lit("Other")))
      .withColumn("technology_subcategory",
        when(byTopic.isNotNull, bySub).otherwise(lit("unknown")))
      .withColumn("classification_confidence",
        when(byTopic.isNotNull, 0.9)
          .when(byLang.isNotNull, 0.6)
          .otherwise(0.3))
  }
}
