package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted index over a text corpus — the corpus-tooling side of the
  * training-data surface (SURVEY §7.4): posting lists for term lookup,
  * and conjunctive search without materializing the index.
  *
  * Scale design: both operators are one explode + one hash aggregate
  * (map-side partial combine carries per-partition distinct terms).
  * `build` shuffles (term → postings); a posting list for a stop word
  * is the classic hot key, so `maxDf` drops terms too common to be
  * useful for lookup (the df cap mirrors [[Contamination]]'s
  * stop-shingle guard). `searchAll` never builds postings at all: the
  * tiny query-term set is an `isin` filter pushed to the scan, then one
  * count-distinct-terms-per-doc aggregate — shuffle is bounded by
  * matching (doc, term) pairs only.
  */
object InvertedIndex {

  /** Posting lists: (term, df, postings = sorted doc ids). Terms are
    * per-document distinct; `minDf`/`maxDf` bound the index to the
    * useful middle of the frequency spectrum.
    *
    * TWO-PASS build: pass 1 aggregates df only (counts — constant-size
    * buffers), the band filter runs on df, and only SURVIVING terms
    * are semi-joined back for the collect_list pass. A stop word's
    * O(n_docs) posting array is never accumulated just to be thrown
    * away — the r4 single-pass build paid that skew/memory cost before
    * filtering (ADVICE r4). */
  def build(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1, maxDf: Long = Long.MaxValue): DataFrame = {
    val termRows = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(col(textCol), " "))).as("term"))
    val surviving = termRows
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
    termRows.join(surviving.select("term"), Seq("term"), "left_semi")
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
  }

  /** Conjunctive (AND) search: ids of documents containing EVERY query
    * term, straight off the corpus — no index materialization. */
  def searchAll(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "terms must be non-empty and distinct")
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(col(textCol), " "))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") === terms.length)
      .select("doc_id")
  }
}
