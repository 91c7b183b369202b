package graft

import graft.operators.{Dedup, Upsert}
import graft.operators.Graph
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
    Graph.connectedComponents(docs.select("doc_id"), "doc_id", verified)
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

  /** Deterministic random corpus: clusters of mutated copies over a
    * small vocabulary, ids interleaved across clusters so any modular
    * split scatters cluster members between corpus and batch. */
  private def genDocs(seed: Int, nClusters: Int, maxSize: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    for (_ <- 0 until nClusters) {
      val base = Vector.fill(12 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      for (_ <- 0 until 1 + rnd.nextInt(maxSize)) {
        // 0-2 word substitutions: high-Jaccard near-dups of the base
        val words = base.toArray
        for (_ <- 0 until rnd.nextInt(3))
          words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        rows += ((id, words.mkString(" "))); id += 1
      }
    }
    rnd.shuffle(rows.toSeq).zipWithIndex
      .map { case ((_, text), i) => (i.toLong, text) }
      .toDF("doc_id", "text")
  }

  test("random corpora: incremental equals full for any modular split") {
    for (seed <- Seq(11, 23, 37)) {
      val docs = genDocs(seed, nClusters = 12, maxSize = 4).persist()
      val m = 2 + seed % 3
      val batch = docs.filter(col("doc_id") % m === 0)
      val corpus = docs.filter(col("doc_id") % m =!= 0)
      val (sigs, labels) = state(corpus)
      val inc = Dedup.incrementalDedup(sigs, labels, corpus, batch,
        "doc_id", "text")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val full = fullLabels(docs)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(inc === full, s"seed $seed, split % $m")
    }
  }

  test("streaming foreachBatch dedup maintains exact full-corpus labels") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = genDocs(7, nClusters = 10, maxSize = 3).persist()
    val rows = docs.as[(Long, String)].collect()

    // mutable persisted state, exactly as a production job would keep
    // it in tables: signature index + label table + seen docs
    val none = docs.filter(col("doc_id") < 0)
    var corpus: DataFrame = none.localCheckpoint(true)
    var sigs: DataFrame = Dedup.minhashSignaturesNarrow(
      none, "doc_id", "text", numHashes = 8).localCheckpoint(true)
    var labels: DataFrame = none.select(col("doc_id"),
      col("doc_id").as("cluster_rep")).localCheckpoint(true)

    val input = MemoryStream[(Long, String)]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint(true)
        labels = Dedup.incrementalDedup(sigs, labels, corpus, b,
          "doc_id", "text").localCheckpoint(true)
        sigs = Upsert.merge(sigs,
          Dedup.minhashSignaturesNarrow(b, "doc_id", "text", numHashes = 8),
          keys = Seq("doc_id")).localCheckpoint(true)
        corpus = corpus.unionByName(b).localCheckpoint(true)
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dedup-ckpt").toString)
      .start()
    try {
      for (m <- 0 until 3) {
        input.addData(rows.filter(_._1 % 3 == m).toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    val streamed = labels
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = fullLabels(docs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed === full,
      "three micro-batches must label exactly like one full run")
  }

  test("degenerate splits: empty batch and empty corpus") {
    val docs = genDocs(5, nClusters = 6, maxSize = 3).persist()
    val empty = docs.filter(col("doc_id") < 0)
    val full = fullLabels(docs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // empty batch: labels are exactly the persisted corpus labels
    val (sigsAll, labelsAll) = state(docs)
    val noBatch = Dedup.incrementalDedup(sigsAll, labelsAll, docs, empty,
      "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(noBatch === full)
    // empty corpus: the increment IS the corpus — pure batch dedup
    val (sigsNone, labelsNone) = state(empty)
    val allBatch = Dedup.incrementalDedup(sigsNone, labelsNone, empty, docs,
      "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(allBatch === full)
  }
}
