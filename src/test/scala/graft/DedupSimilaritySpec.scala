package graft

import graft.operators.{Dedup, Similarity}
import graft.operators.Graph
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different content about spark engines here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under min id") {
    val out = Dedup.exactByDigest(docs, "doc_id", "text")
      .orderBy("rep_id").as[(String, Long, Long)].collect()
    assert(out.length === 3)
    assert(out.head._2 === 1L && out.head._3 === 2L) // ids 1+2 collapse
  }

  test("identical docs share all minhash signatures; near-dups share some") {
    val sh = Dedup.shingles(docs, "doc_id", "text")
    val sigs = Dedup.minhashSignatures(sh, "doc_id", numHashes = 8)
      .orderBy("doc_id").collect()
    val s1 = sigs(0).toSeq.drop(1)
    val s2 = sigs(1).toSeq.drop(1)
    val s3 = sigs(2).toSeq.drop(1)
    val s4 = sigs(3).toSeq.drop(1)
    assert(s1 === s2, "identical text => identical signature")
    assert(s1.zip(s3).count { case (a, b) => a == b } >= 2,
      "near-dup shares some minhashes")
    assert(s1.zip(s4).count { case (a, b) => a == b } === 0,
      "unrelated docs share no minhashes (w.h.p.)")
  }

  test("narrow simhash equals the shuffle/aggregation form") {
    val docsT = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaAgg = Dedup.simhash(docsT, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect()
    val viaNarrow = Dedup.simhashNarrow(docsT, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(viaNarrow === viaAgg)
  }

  test("narrow minhash signatures equal the shuffle/aggregation form") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaAgg = Dedup.minhashSignatures(
      Dedup.shingles(docs, "doc_id", "text", dedupe = false), "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaNarrow = Dedup.minhashSignaturesNarrow(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaNarrow.length === viaAgg.length)
    viaNarrow.zip(viaAgg).foreach { case (n, a) => assert(n === a) }
  }

  test("LSH candidates find exact and near dups, verified by jaccard") {
    val sh = Dedup.shingles(docs, "doc_id", "text")
    val sigs = Dedup.minhashSignatures(sh, "doc_id", numHashes = 8)
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(sigs, "doc_id", 8, rowsPerBand = 2), "doc_id")
    val verified = Dedup.jaccardOnPairs(sh, "doc_id", pairs)
      .orderBy("id_a", "id_b").collect()
    val exact = verified.find(r => r.getLong(1) == 1L && r.getLong(0) == 2L)
      .orElse(verified.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L))
    assert(exact.isDefined, s"pair (1,2) must be a candidate; got ${verified.mkString}")
    assert(exact.get.getAs[Double]("jaccard") === 1.0)
  }

  test("simhash: identical => equal, near-dup => close, different => far") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(0) === sigs(1))
    assert(hamming(sigs(0), sigs(2)) <= 24)
    assert(hamming(sigs(0), sigs(3)) > hamming(sigs(0), sigs(2)))
  }

  test("simhash pigeonhole banding loses no qualifying pair at radius 3") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
    val banded = Dedup.simhashPairs(sigs, "doc_id", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val raw = sigs.as[(Long, Long)].collect()
    val exact = (for {
      (a, sa) <- raw; (b, sb) <- raw if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded === exact)
    assert(exact.contains((1L, 2L, 0)), "identical docs must pair at h=0")
  }

  test("dedup clusters: chains collapse to the min id, singletons stand alone") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3 (transitive through 2), pair 5-6, singleton 4
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Graph.connectedComponents(nodes, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("reliable-checkpoint path (spark.graft.checkpoint.dir) gives identical clusters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    spark.conf.set(graft.spark.Lineage.DirConf, dir)
    try {
      val out = Graph.connectedComponents(nodes, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
      val outStar = Graph.connectedComponentsLogN(nodes, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      assert(outStar === out)
      // the iterated frames really were checkpointed reliably (to disk)
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0, s"expected reliable checkpoint files under $dir")
    } finally {
      spark.conf.unset(graft.spark.Lineage.DirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("large-star/small-star components equal min-propagation on random graphs") {
    import org.scalacheck.{Gen, rng}
    val nodeGen = Gen.chooseNum(0L, 40L)
    (1 to 5).foreach { seedI =>
      val pairsRaw = Gen.listOfN(30, Gen.zip(nodeGen, nodeGen))
        .apply(Gen.Parameters.default, rng.Seed(seedI.toLong)).get
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val nodes = (0L to 40L).toDF("doc_id")
      val pairs = pairsRaw.toDF("id_a", "id_b")
      val viaProp = Graph.connectedComponents(nodes, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      val viaStar = Graph.connectedComponentsLogN(nodes, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      assert(viaStar === viaProp, s"seed $seedI, pairs $pairsRaw")
    }
  }

  test("large-star/small-star handles a long chain (the min-propagation worst case)") {
    // path 0-1-2-...-30: min-propagation needs ~30 rounds; the
    // alternating algorithm converges in O(log n)
    val n = 30L
    val nodes = (0L to n).toDF("doc_id")
    val chain = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Graph.connectedComponentsLogN(nodes, "doc_id", chain)
      .as[(Long, Long)].collect()
    assert(out.forall(_._2 === 0L), s"all chain nodes join cluster 0: ${out.mkString}")
  }

  test("cosine: self-similarity 1, orthogonal 0") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.7071f, 0.7071f, 0.0f))
    ).toDF("vec_id", "embedding")
    val sims = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("sim"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(sims((1L, 1L)) - 1.0) < 1e-6)
    assert(math.abs(sims((1L, 2L))) < 1e-6)
    assert(math.abs(sims((1L, 3L)) - 0.7071) < 1e-3)
  }

  test("brute-force top-k returns nearest neighbors in rank order") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 1), vecs, "vec_id", "embedding", k = 2)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    assert(out.map(_._2).toSeq === Seq(2L, 3L), "nearest then next")
  }

  test("banded near-dup pairs are a subset of exact pairs with identical sims") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val banded = Similarity.nearDupPairsBanded(e, "vec_id", "embedding", 0.4, dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(banded.nonEmpty, "planted near-dups must surface")
    banded.foreach { case (a, b, s) =>
      assert(exact.get((a, b)).contains(s),
        s"banded pair ($a,$b,$s) must appear in the exact set with the same sim")
    }
    // high-similarity pairs (the ones a dedup user cares about) must be
    // recalled: P(miss) = (1-(1-θ/π)^4)^4 is <2% at cos >= 0.9
    val hot = exact.filter(_._2 >= 0.9).keySet
    val found = banded.map(t => (t._1, t._2)).toSet
    assert(hot.forall(found), s"missed high-sim pairs: ${hot -- found}")
  }

  test("LSH top-k results are a subset of valid pairs with correct sims") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.bruteForceTopK(
      e.filter($"vec_id" < 5), e, "vec_id", "embedding", 5)
    val approx = Similarity.lshTopK(
      e.filter($"vec_id" < 5), e, "vec_id", "embedding", 5, dim = 64)
    val exactPairs = exact.select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val approxRows = approx.select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    // approximate sims must agree with the exact computation when the
    // pair is also in the exact top-k
    approxRows.foreach { case (q, n, s) =>
      exactPairs.get((q, n)).foreach(es => assert(es === s))
    }
    assert(approxRows.nonEmpty)
  }

  test("selfTopK covers every id's bucket-mates with exact sims") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val self = Similarity.selfTopK(e, "vec_id", "embedding", k = 3, dim = 64)
      .as[(Long, Long, Int, Double)].collect()
    assert(self.nonEmpty)
    // every reported sim must equal the exact cosine for that pair, and
    // ranks must be 1..n dense per query
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding",
      k = Int.MaxValue)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    self.foreach { case (q, n, _, s) =>
      assert(exact((q, n)) === s, s"sim mismatch for ($q,$n)")
    }
    self.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq,
        s"ranks for $q must be dense from 1")
    }
    // the planted near-dup pairs (cos >= 0.9 somewhere in the fixture)
    // are exactly what a kNN-graph dedup needs — they must be recalled
    // as each other's rank-1 neighbors
    val hot = exact.filter { case (_, s) => s >= 0.9 }.keySet
    val found = self.map(t => (t._1, t._2)).toSet
    assert(hot.forall(found), s"missed high-sim edges: ${hot -- found}")
  }

  test("keepCanonical keeps one best doc per cluster with sizes") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "short", 5L), (2L, "much longer text", 16L), (3L, "mid", 3L),
      (4L, "solo", 4L)).toDF("doc_id", "text", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_rep")
    val kept = Dedup.keepCanonical(docs, "doc_id", clusters,
      Seq($"n_chars".desc, $"doc_id"))
      .select("doc_id", "cluster_rep", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    // cluster 1: doc 2 wins on length; cluster 3: doc 4 wins (4 > 3)
    assert(kept === Set((2L, 1L, 2L), (4L, 3L, 2L)))
  }

  test("inverted index builds banded posting lists; AND-search is exact") {
    import graft.operators.InvertedIndex
    val docs = Seq(
      (1L, "spark window merge"),
      (2L, "spark window"),
      (3L, "spark spark spark"),   // per-doc distinct: df counts once
      (4L, "merge window spark"),
      (5L, "unrelated words")).toDF("id", "text")
    val idx = InvertedIndex.build(docs, "id", "text", minDf = 2, maxDf = 3)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[collection.Seq[Long]]("postings").toSeq))
      .toMap
    // spark df=4 exceeds maxDf; unrelated/words df=1 below minDf
    assert(idx.keySet === Set("window", "merge"))
    assert(idx("window") === ((3L, Seq(1L, 2L, 4L))))
    assert(idx("merge") === ((2L, Seq(1L, 4L))))
    val hits = InvertedIndex.searchAll(docs, "id", "text",
      Seq("spark", "window", "merge")).as[Long].collect().sorted
    assert(hits.toSeq === Seq(1L, 4L))
  }

  test("contamination report finds planted train/test overlap with exact counts") {
    import graft.operators.Contamination
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "totally unrelated training words here")).toDF("id", "text")
    val test = Seq(
      (10L, "alpha beta gamma delta zeta"),   // shares 2 3-grams with doc 1
      (11L, "clean holdout document nothing shared"),
      (12L, "xx one two three four yy")        // shares 2 3-grams with doc 2
    ).toDF("id", "text")
    val rep = Contamination.report(train, test, "id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("test_id") ->
        (r.getAs[Long]("n_train_docs"), r.getAs[Long]("max_common"),
          r.getAs[Long]("n_shingles"), r.getAs[Long]("n_found"))).toMap
    // doc 10: grams {abg, bgd, gdz}; train doc 1 has {abg, bgd, gde} -> 2
    assert(rep(10L) === ((1L, 2L, 3L, 2L)))
    assert(rep(11L) === ((0L, 0L, 3L, 0L)))
    assert(rep(12L) === ((1L, 2L, 4L, 2L)))
  }

  test("contamination df-cap drops stop-phrase shingles from candidates") {
    import graft.operators.Contamination
    // "the end of" appears in EVERY train doc (df=3) — a stop phrase;
    // the real signal is doc 1's unique overlap
    val train = Seq(
      (1L, "unique alpha signal the end of"),
      (2L, "other words entirely the end of"),
      (3L, "more filler text the end of")).toDF("id", "text")
    val test = Seq((10L, "unique alpha signal the end of")).toDF("id", "text")
    val capped = Contamination.overlapPairs(train, test, "id", "text",
      k = 3, maxShingleDf = Some(2))
      .collect().map(r => (r.getAs[Long]("test_id"), r.getAs[Long]("train_id"))
        -> r.getAs[Long]("n_common")).toMap
    // with the stop-shingle dropped only doc 1's genuine grams remain
    assert(capped.keySet === Set((10L, 1L)))
    val uncapped = Contamination.overlapPairs(train, test, "id", "text", k = 3)
      .collect()
    assert(uncapped.length === 3, "without the cap every train doc collides")
  }
}
