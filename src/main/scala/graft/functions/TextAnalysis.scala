package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library — language-ID, quality scoring, token
  * counting, fingerprinting (SURVEY.md extension surface; scalar-suite
  * style follows the reference's cleaning/scoring chains,
  * `notebooks/bronze_to_silver_transformation.py:686-734,769-782`).
  *
  * Everything is built from codegen'd built-ins (no UDFs) and integer /
  * exact arithmetic, so results are identical on any engine that
  * implements the same ANSI semantics — which is what makes these
  * oracle-checkable.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Reference-exact description cleaning
    * (utils/data_transformer.py:286-299), in its order: collapse
    * whitespace runs + strip, remove markdown images `![..](..)`, then
    * links `[..](..)` (non-greedy, leftmost — identical in RE2 and Java
    * regex for these patterns), cap at 500 chars, final strip. */
  def cleanDescription(description: Column): Column = {
    val collapsed =
      trim(regexp_replace(coalesce(description, lit("")), "\\s+", " "))
    val noImages = regexp_replace(collapsed, "!\\[.*?\\]\\(.*?\\)", "")
    val noLinks = regexp_replace(noImages, "\\[.*?\\]\\(.*?\\)", "")
    trim(substring(noLinks, 1, 500))
  }

  /** Occurrences of ` word ` in the space-padded text via replace
    * arithmetic — non-overlapping left-to-right scan, identical semantics
    * in every engine's `replace`. */
  def markerCount(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val marker = s" $word "
    ((length(padded) - length(replace(padded, lit(marker), lit(""))))
      / lit(marker.length)).cast("int")
  }

  /** Language markers: one high-frequency function word per language. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "de" -> "der", "es" -> "el", "fr" -> "le", "zh" -> "的")

  /** N-gram-heuristic language ID: argmax of marker counts with a fixed
    * tie-break order (the declaration order of [[langMarkers]]). */
  def langId(text: Column): Column = {
    val counts = langMarkers.map { case (lang, w) => lang -> markerCount(text, w) }
    val arms = counts.zipWithIndex.map { case ((lang, c), i) =>
      val others = counts.zipWithIndex.collect { case ((_, c2), j) if j != i => c2 }
      lang -> others.map(o => c >= o).reduce(_ && _)
    }
    arms.init.foldRight(lit(arms.last._1): Column) {
      case ((lang, cond), acc) => when(cond, lang).otherwise(acc)
    }
  }

  /** Mean word length: non-space chars / tokens (double, exact ratio of
    * exact ints). */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  /** Stopword ratio: (the|a|of|to|and occurrences) / tokens. */
  def stopwordRatio(text: Column): Column = {
    val stops = Seq("the", "a", "of", "to", "and")
    stops.map(markerCount(text, _)).reduce(_ + _).cast("double") / tokenCount(text)
  }

  /** Additive quality scorecard in [0,100] (integer points, exact):
    * length band + word-shape band + stopword band + no-markup. Mirrors
    * the reference's scorecard style (bronze_to_silver_transformation.py:
    * 769-782). */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text)
    val awl = avgWordLen(text)
    val sr = stopwordRatio(text)
    val noMarkup = !(text.contains("<") || text.contains("http"))
    greatest(least(
      when(toks.between(10, 500), 25).otherwise(0)
        + when(awl.between(2.0, 10.0), 25).otherwise(0)
        + when(sr.between(0.01, 0.5), 25).otherwise(10)
        + when(noMarkup, 25).otherwise(0),
      lit(100)), lit(0))
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — stable under reformatting, the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** PII patterns for the pre-training scrub pass: emails, URLs, and
    * NANP-style phone numbers. Deliberately conservative and
    * RE2-compatible (no lookarounds, no backrefs) so any engine —
    * Spark's Java regex, DuckDB/RE2 — reproduces the identical
    * redaction; that reproducibility is what makes the scrub
    * oracle-checkable. Order matters and is part of the contract:
    * emails redact before URLs so `http://user@host/` becomes
    * `http://<EMAIL>/` then `<URL>`, identically everywhere. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "URL" -> "https?://[^\\s]+",
    "PHONE" -> "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b")

  /** Redact every PII match with its `<KIND>` token. Map-side only. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (kind, p)) =>
      regexp_replace(c, p, s"<$kind>")
    }

  /** Per-kind PII match counts:
    * `struct(n_email, n_url, n_phone)` — the audit/reporting side of
    * the scrub (counted on the ORIGINAL text, before redaction). */
  def piiCounts(text: Column): Column =
    struct(piiPatterns.map { case (kind, p) =>
      size(regexp_extract_all(text, lit(p), lit(0))).cast("long")
        .as(s"n_${kind.toLowerCase}")
    }: _*)

  /** Intra-document n-gram repetition statistics (the Gopher-style
    * repetition quality filter): `struct(n_grams, n_distinct, top_n)` —
    * total word n-grams, distinct n-grams, and the count of the most
    * frequent one. Entirely NARROW (no explode, no shuffle — the
    * per-doc-filter shape that holds at 100 TB), computed by the
    * codegen'd [[NgramRepetition]] expression in one hash-map pass per
    * document. Documents with fewer than `n` tokens report (0, 0, 0). */
  def ngramRepetition(text: Column, n: Int): Column =
    NgramRepetition.ngramRepetition(text, n)
}
