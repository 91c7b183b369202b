package graft.queries

import graft.Tables
import graft.functions.Scores
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
        SELECT doc_id, lang AS dist_lang, 70.0 AS pct FROM documents
        UNION ALL
        SELECT doc_id, l AS dist_lang, 7.5 AS pct
        FROM documents,
             UNNEST([${langs.map(l => s"'$l'").mkString(", ")}]) AS u(l)
        WHERE l != lang
        ORDER BY doc_id, dist_lang"""))
  )
}
