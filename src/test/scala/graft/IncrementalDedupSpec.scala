package graft

import graft.operators.{Dedup, Upsert}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup (d10's operator): a batch deduped against
  * persisted state (signature index + label table) must label every
  * doc EXACTLY as a full-corpus re-run would — including rep
  * lowerings when a batch doc becomes the new cluster minimum and
  * bridge merges when a batch doc connects two existing clusters. */
class IncrementalDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Full-corpus clustering with the d8/d9 machinery. */
  private def fullLabels(docs: DataFrame): DataFrame = {
    val sh = Dedup.shingles(docs, "doc_id", "text", dedupe = false).persist()
    val sigs = Dedup.minhashSignaturesNarrow(docs, "doc_id", "text", numHashes = 8)
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(sigs, "doc_id", numHashes = 8, rowsPerBand = 2), "doc_id")
    val verified = Dedup.jaccardOnPairs(sh, "doc_id", pairs)
      .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
    Dedup.dedupClusters(docs.select("doc_id"), "doc_id", verified)
  }

  /** Stage-1 state: (signature index, label table) for a corpus. */
  private def state(corpus: DataFrame): (DataFrame, DataFrame) = {
    val sigs = Dedup.minhashSignaturesNarrow(corpus, "doc_id", "text",
      numHashes = 8).persist()
    (sigs, fullLabels(corpus))
  }

  test("one increment labels every doc exactly as a full re-run") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val (sigs, labels) = state(corpus)
    val inc = Dedup.incrementalDedup(sigs, labels, corpus, batch,
      "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = fullLabels(docs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(inc.length === full.length)
    assert(inc === full)
    // the %5 split interleaves ids, so batch docs DO become cluster
    // minima — assert the rep-lowering path actually ran
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(full.exists { case (id, rep) => !batchIds(id) && batchIds(rep) },
      "fixture must contain a corpus doc relabelled to a batch rep")
  }

  test("successive increments with Upsert-merged state equal a full run") {
    val docs = Tables.documents(spark, sf)
    val part0 = docs.filter(col("doc_id") % 3 === 0)
    val part1 = docs.filter(col("doc_id") % 3 === 1)
    val part2 = docs.filter(col("doc_id") % 3 === 2)

    // day 0: bootstrap state from part0
    val (sigs0, labels0) = state(part0)
    // day 1: increment part1, then MERGE the new signatures and labels
    // into the persisted state — the real index-maintenance step
    val labels1 = Dedup.incrementalDedup(sigs0, labels0, part0, part1,
      "doc_id", "text").persist()
    val sigs1 = Upsert.merge(sigs0,
      Dedup.minhashSignaturesNarrow(part1, "doc_id", "text", numHashes = 8),
      keys = Seq("doc_id")).persist()
    // day 2: increment part2 against the merged state
    val corpus01 = docs.filter(col("doc_id") % 3 =!= 2)
    val labels2 = Dedup.incrementalDedup(sigs1, labels1, corpus01, part2,
      "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))

    val full = fullLabels(docs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels2 === full)
  }
}
