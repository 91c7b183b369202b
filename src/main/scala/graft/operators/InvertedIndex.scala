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

  /** RANKED retrieval: BM25 top-k (Robertson/Spärck Jones; the Lucene
    * default scoring family) over the corpus, completing t18's boolean
    * AND with the scored form a retrieval pipeline actually serves:
    *
    *   score(d) = Σ_t ln(1 + (N − df_t + ½)/(df_t + ½))
    *              · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))
    *
    * Scale shape — no corpus self-join, no index materialization:
    *   1. tf rows: explode → `isin` filter (pushed to the scan) →
    *      hash-agg on (doc, term); shuffle bounded by MATCHING pairs;
    *   2. df: a ≤|terms|-row aggregate of the tf frame, broadcast back;
    *   3. N and avgdl: ONE 1-row global aggregate, broadcast crossJoin
    *      (the w4_share_broadcast pattern — no grand-total window);
    *   4. per-doc sum is an exact DECIMAL accumulation (order-
    *      independent — [[graft.functions.Deterministic]]);
    *   5. top-k is TakeOrdered (score DESC, id ASC) — never a global
    *      rank window; the rank column is attached AFTER the limit, a
    *      k-row bounded window.
    *
    * Per-term components round to 6 dp before the decimal sum, so the
    * score is engine-exact on deterministic corpora (the oracle
    * replays it bit-for-bit). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "terms must be non-empty and distinct")
    require(k > 0, s"k must be positive, got $k")
    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val comp = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c", round(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1))
          / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))),
        6))
    val scored = comp.groupBy("doc_id")
      .agg(graft.functions.Deterministic.dsum(col("c")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    scored.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))))
      .select("rank", "doc_id", "score")
  }
}
