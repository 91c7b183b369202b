package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — the train/eval overlap sweep
  * every LLM training-data pipeline runs before a model ships: which
  * held-out documents share word k-grams with the training corpus, with
  * which training documents, and how much of each held-out document is
  * covered. (Not in the reference — part of the SURVEY §7.4 training-
  * data extension surface, alongside [[Dedup]].)
  *
  * Scale design: candidate generation is an equi-join on the shingle —
  * both corpora shuffle by shingle hash, never pairwise, so the sweep
  * scales out like [[Dedup]]'s LSH path. The one skew hazard is a
  * stop-phrase shingle shared by millions of training docs; the
  * standard remedy (drop shingles above a train-side document-frequency
  * cap — they carry no contamination signal) is one extra hash-agg,
  * `maxShingleDf`.
  */
object Contamination {

  /** (test_id, train_id, n_common): distinct shared k-gram counts for
    * every overlapping cross-corpus pair. */
  def overlapPairs(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, k: Int = 3,
      maxShingleDf: Option[Long] = None): DataFrame =
    pairsFrom(testShingles(test, idCol, textCol, k),
      trainShingles(train, idCol, textCol, k, maxShingleDf))

  /** Per-held-out-document contamination report: every test doc (with
    * ≥ k tokens) with the number of training docs it overlaps, the
    * largest single-doc overlap, its shingle count, how many of its
    * shingles occur anywhere in train, and that share — uncontaminated
    * docs report zeros, so the output is a complete audit, not just the
    * hits. */
  def report(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, k: Int = 3,
      maxShingleDf: Option[Long] = None): DataFrame = {
    // both shingle frames feed two joins each — persist so the
    // explode+distinct shuffles run once (the d2 pattern)
    val tr = trainShingles(train, idCol, textCol, k, maxShingleDf).persist()
    val te = testShingles(test, idCol, textCol, k).persist()
    val pairs = pairsFrom(te, tr)
    val perTest = pairs.groupBy("test_id").agg(
      count(lit(1)).as("n_train_docs"),
      max(col("n_common")).as("max_common"))
    val sizes = te.groupBy("test_id").agg(count(lit(1)).as("n_shingles"))
    // distinct test shingles found anywhere in train: dedupe the train
    // side to its shingle set first so hot shingles don't multiply rows
    val found = te.join(tr.select("shingle").distinct(), "shingle")
      .groupBy("test_id").agg(count(lit(1)).as("n_found"))
    sizes
      .join(perTest, Seq("test_id"), "left")
      .join(found, Seq("test_id"), "left")
      .select(col("test_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("max_common"), lit(0L)).as("max_common"),
        col("n_shingles"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        round(coalesce(col("n_found"), lit(0L)) /
          col("n_shingles").cast("double"), 6).as("contaminated_frac"))
  }

  private def pairsFrom(te: DataFrame, tr: DataFrame): DataFrame =
    te.join(tr, "shingle")
      .groupBy("test_id", "train_id")
      .agg(count(lit(1)).as("n_common"))

  private def testShingles(test: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    Dedup.shingles(test, idCol, textCol, k)
      .select(col(idCol).as("test_id"), col("shingle"))

  private def trainShingles(train: DataFrame, idCol: String, textCol: String,
      k: Int, maxShingleDf: Option[Long]): DataFrame = {
    val tr = Dedup.shingles(train, idCol, textCol, k)
      .select(col(idCol).as("train_id"), col("shingle"))
    maxShingleDf match {
      case Some(cap) =>
        val keep = tr.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("shingle")
        tr.join(keep, "shingle")
      case None => tr
    }
  }
}
