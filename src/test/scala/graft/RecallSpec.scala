package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Recall of the approximate operators against their exact
  * counterparts — measured, not guessed. Everything here is
  * deterministic (md5-derived planes/signatures over fixed testdata),
  * so these are pinned regression values, not flaky statistics.
  */
class RecallSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("MinHash-LSH candidates capture every true jaccard>=0.5 pair at sf0.01") {
    val docs = Tables.documents(spark, sf)
    val sh = Dedup.shingles(docs, "doc_id", "text", dedupe = false).persist()
    // ground truth: every pair sharing >=1 shingle, exactly verified
    val allPairs = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), "shingle")
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    val truth = Dedup.jaccardOnPairs(sh, "doc_id", allPairs)
      .filter(col("jaccard") >= 0.5).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val sigs = Dedup.minhashSignaturesNarrow(docs, "doc_id", "text", numHashes = 8)
    val cand = Dedup.lshCandidatePairs(
      Dedup.lshBands(sigs, "doc_id", numHashes = 8, rowsPerBand = 2), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the d4->d8 pipeline loses NO qualifying pair on this corpus: the
    // dup clusters are high-jaccard, where 4 bands of 2 hashes have
    // near-certain collision probability — and the candidate set stays
    // within ~12% of the truth set (precision), so verification work is
    // bounded too
    assert((truth -- cand).isEmpty, s"missed pairs: ${truth -- cand}")
    assert(cand.size <= truth.size * 2, s"candidate explosion: ${cand.size}")
  }

  test("selfTopK recall@5 rises with banding exactly as the LSH formula predicts") {
    val e = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nBands: Int, planesPerBand: Int): Double = {
      val approx = Similarity.selfTopK(e, "vec_id", "embedding", 5, 64,
        nBands = nBands, planesPerBand = planesPerBand)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    // near-uniform unit vectors are LSH's worst case (true neighbors
    // are barely closer than the rest), so the default 4x4 banding
    // trades recall for a 16x candidate reduction; widening the band
    // count recovers it, per P(candidate) = 1-(1-p^ppb)^nBands.
    // Measured (deterministic): 0.4228 -> 0.9996.
    val r44 = recall(4, 4)
    val r162 = recall(16, 2)
    assert(r44 >= 0.42, s"default banding recall regressed: $r44")
    assert(r162 >= 0.99, s"wide banding must recover recall: $r162")
    assert(r162 > r44)
  }

  test("random projection preserves pairwise distances to the JL bound") {
    // What JL guarantees — and what it does NOT: pairwise squared
    // distances survive 64→16 within ~1/√16 distortion (measured mean
    // ratio 0.972 over 3367 pairs, all within [0.22, 2.5]); top-k
    // RANKING does not survive on near-uniform vectors, where every
    // pair is nearly equidistant and 25% distortion scrambles order
    // (measured recall@5 ≈ 0.08 — that is the data's geometry, not a
    // bug; real clustered embeddings keep their neighbors).
    val e = Tables.embeddings(spark, sf)
    val proj = Similarity.randomProject(e, "vec_id", "embedding", 64, 16)
      .select(col("vec_id"),
        array((0 until 16).map(p => col(s"p$p")): _*).as("pv"))
    val j = e.join(proj, "vec_id")
    val a = j.select(col("vec_id").as("ida"), col("embedding").as("ea"),
      col("pv").as("pa"))
    val b = j.select(col("vec_id").as("idb"), col("embedding").as("eb"),
      col("pv").as("pb"))
    val stats = a.crossJoin(b) // deterministic 1-in-37 pair sample
      .filter(col("ida") < col("idb") && (col("ida") + col("idb")) % 37 === 0)
      .select(
        expr("""aggregate(zip_with(ea, eb,
                (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
                0.0D, (acc, v) -> acc + v)""").as("d2"),
        expr("""aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)),
                0.0D, (acc, v) -> acc + v)""").as("p2"))
      .withColumn("ratio", col("p2") / 16.0 / col("d2"))
      .agg(min("ratio").as("mn"), max("ratio").as("mx"),
        avg("ratio").as("av"), count(lit(1)).as("n")).head()
    assert(stats.getAs[Long]("n") > 3000)
    assert(stats.getAs[Double]("av") > 0.90 && stats.getAs[Double]("av") < 1.05,
      s"mean distortion drifted: ${stats.getAs[Double]("av")}")
    assert(stats.getAs[Double]("mn") > 0.15 && stats.getAs[Double]("mx") < 3.0,
      s"distortion tail outside the JL band: $stats")
  }

  test("PQ reconstruction recall is deterministic and above the verdict bound") {
    // Measured recall@10 on these near-uniform synthetic vectors:
    // 0.2–0.6 across sf0.001/0.01/0.1 (same geometry caveat as JL —
    // all pairwise cosines are nearly equal, so ANY lossy compression
    // scrambles fine rank order; clustered real embeddings fare far
    // better). The pipeline is bit-deterministic (md5 seeds, decimal
    // sums, fixed tie-breaks), so the exact values are a regression
    // pin, not a statistical sample.
    import graft.operators.{ProductQuantizer, Similarity}
    val e = Tables.embeddings(spark, sf)
    val model = ProductQuantizer.train(e, "vec_id", "embedding",
      dim = 64, m = 8, k = 64, iters = 3)
    // reconstruction error: per-vector squared L2 must be well under
    // the unit norm (the codes genuinely carry the vector)
    val recon = e.select(col("vec_id"),
      col("embedding"),
      ProductQuantizer.reconstructCol(
        ProductQuantizer.encodeCol(col("embedding"), model), model).as("rv"))
    val err = recon.select(
      expr("""aggregate(zip_with(embedding, rv,
              (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
              0.0D, (acc, v) -> acc + v)""").as("e2"))
      .agg(avg("e2")).head().getDouble(0)
    assert(err < 0.5, s"mean squared reconstruction error too high: $err")
    val queries = e.filter(col("vec_id") < 5)
    val approx = ProductQuantizer.topK(queries, e, "vec_id", "embedding",
      model, 10).select("query_id", "neighbor_id")
    val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding",
      10).select("query_id", "neighbor_id")
    val recalls = approx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg((count(lit(1)) / 10.0).as("r"))
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("r"))
      .toMap
    assert(recalls.values.forall(_ >= 0.15),
      s"per-query recall under the v12 verdict bound: $recalls")
  }

  test("IVF-PQ residual encoding pays: v13 beats plain PQ at full probe width") {
    // The composed index (IvfPq: coarse lists + PQ over RESIDUALS) vs
    // v12's plain PQ at the same codebook budget (m=8, k=64, 3 Lloyd
    // rounds). Measured overall recall@10 at sf0.01 (deterministic —
    // these are regression pins): v12 = 0.42; v13 nProbe=16 (all lists,
    // pure residual effect) = 0.50; nProbe=8 (half the lists probed,
    // the v13 gate shape) = 0.44 with per-query min 0.2 — which is why
    // the v13 verdict bound of 0.15 holds with margin at every sf.
    import graft.operators.{IvfPq, ProductQuantizer}
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val a = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (a & exact).size.toDouble / exact.size
    }
    val pq = ProductQuantizer.train(e, "vec_id", "embedding", 64, 8, 64, 3)
    val v12 = recallOf(ProductQuantizer.topK(queries, e, "vec_id", "embedding", pq, 10))
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 16, coarseIters = 2, m = 8, k = 64, pqIters = 3)
    val full = recallOf(IvfPq.topK(queries, e, "vec_id", "embedding", model, 10, 16))
    val half = recallOf(IvfPq.topK(queries, e, "vec_id", "embedding", model, 10, 8))
    assert(full >= v12,
      s"residual encoding must not lose to plain PQ at full probe: $full < $v12")
    assert(half >= 0.4, s"half-probe recall regressed: $half")
    // bounded (scale) and window forms agree exactly
    val win = IvfPq.topK(queries, e, "vec_id", "embedding", model, 10, 8)
    val bnd = IvfPq.topK(queries, e, "vec_id", "embedding", model, 10, 8,
      bounded = true)
    assert(win.exceptAll(bnd).isEmpty && bnd.exceptAll(win).isEmpty,
      "bounded-heap and window top-k must be identical")
  }

  test("persisted IVF-PQ index round-trips exactly: searchIndex == inline topK") {
    // floats round-trip parquet bit-exactly, so the save/load/search
    // path (v14) must return the IDENTICAL result set as the inline
    // index (v13) — any divergence means the persistence layer, not
    // the data, changed the answers.
    import graft.operators.IvfPq
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 5)
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 16, coarseIters = 2, m = 8, k = 64, pqIters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-rt").toString
    try {
      IvfPq.save(model, spark, dir)
      IvfPq.index(e, "vec_id", "embedding", model)
        .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/index")
      val reloaded = IvfPq.load(spark, dir)
      assert(reloaded.coarse.map(_.toSeq) === model.coarse.map(_.toSeq))
      assert(reloaded.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
        model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      val inline = IvfPq.topK(queries, e, "vec_id", "embedding", model, 10, 8)
      val persisted = IvfPq.searchIndex(queries,
        spark.read.parquet(s"$dir/index"), "vec_id", "embedding",
        reloaded, 10, 8)
      assert(inline.exceptAll(persisted).isEmpty &&
        persisted.exceptAll(inline).isEmpty,
        "persisted-index search must equal the inline index bit-exactly")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("exact re-ranking dominates the plain ADC path (IVFADC+R)") {
    // v17: the rerank shortlist (ADC top-k·refine) is a superset of the
    // ADC top-k, and exact scoring restores every true neighbor in the
    // shortlist to its true rank — so per-query recall can only rise.
    // Pinned ≥ everywhere and strictly above in aggregate (measured:
    // ADC 0.2–0.6, rerank 0.5–1.0 on this data geometry).
    import graft.operators.IvfPq
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 5)
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 16, coarseIters = 2, m = 8, k = 64, pqIters = 3)
    val idx = IvfPq.index(e, "vec_id", "embedding", model, withNorm = true)
    val k = 10
    val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id")
        .agg((count(lit(1)).cast("double") / k).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val adc = recall(IvfPq.searchIndexAdc(
      queries, idx, "vec_id", "embedding", model, k, 8))
    val rr = recall(IvfPq.searchIndexRerank(
      queries, idx, e, "vec_id", "embedding", model, k, 8, refine = 3))
    adc.keySet.foreach { q =>
      assert(rr(q) >= adc(q),
        s"rerank lost recall on query $q: ${rr(q)} < ${adc(q)}")
    }
    assert(rr.values.sum > adc.values.sum,
      s"rerank must strictly improve aggregate recall: " +
        s"${rr.values.sum} vs ${adc.values.sum}")
    assert(rr.values.min >= 0.5,
      s"rerank recall floor regressed below the v17 verdict margin: ${rr.values.min}")
  }

  test("filtered+re-ranked search clears the raised v16 floor at every sf") {
    // v16's gate bound was lifted 0.15 → 0.5 in round 8 when the
    // filtered path switched to IVFADC+R (re-rank over the filtered
    // index) with over-probing and over-refining (nProbe 12, refine 20
    // — a selective filter empties part of each probed list, so the
    // probe set and shortlist must widen to keep the candidate pool;
    // measured: nProbe=8/refine=3 leaves a 0.4 floor at sf0.001 and
    // 0.2 at sf0.1; 12/20 lifts those to 0.8 and 0.6). This pins the
    // measured per-query floor at all three scale factors so the gate
    // bound is known-safe, and pins rerank ≥ the plain reconstruct
    // path per query at the same probe width (the superset-shortlist
    // argument applies under a filter exactly as without one).
    import graft.operators.IvfPq
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, sfDir)
      val queries = e.filter(col("vec_id") < 5)
      val model = IvfPq.train(e, "vec_id", "embedding", 64,
        nLists = 16, coarseIters = 2, m = 8, k = 64, pqIters = 3)
      val idx = IvfPq.index(e, "vec_id", "embedding", model,
        withNorm = true, metaCols = Seq("label")).filter(col("label") < 5)
      val k = 10
      val exact = Similarity.bruteForceTopK(queries,
        e.filter(col("label") < 5), "vec_id", "embedding", k)
        .select("query_id", "neighbor_id")
      def recall(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
        df.select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id"))
          .groupBy("query_id")
          .agg((count(lit(1)).cast("double") / k).as("r"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val plain = recall(IvfPq.searchIndex(
        queries, idx, "vec_id", "embedding", model, k, 12))
      val rr = recall(IvfPq.searchIndexRerank(
        queries, idx, e, "vec_id", "embedding", model, k, 12, refine = 20))
      info(s"$sfDir: plain=${plain.toSeq.sortBy(_._1)} rerank=${rr.toSeq.sortBy(_._1)}")
      plain.keySet.foreach { q =>
        assert(rr(q) >= plain(q),
          s"$sfDir: filtered rerank lost recall on query $q: ${rr(q)} < ${plain(q)}")
      }
      assert(rr.values.min >= 0.5,
        s"$sfDir: filtered rerank floor under the v16 gate bound: ${rr.values.min}")
    }
  }

  test("adc_lookup_sum fails loudly on codes outside the model's [0, k)") {
    // A stale persisted index read under a narrower PQ model must not
    // silently score against the wrong table entry — the expression
    // bounds-checks every code in both eval and codegen.
    import graft.functions.VectorExpressions.adcSum
    import spark.implicits._
    val k = 4
    val ok = Seq((Array(0, 3, 1), Array.fill(3 * k)(0.5)))
      .toDF("codes", "tbl")
    assert(ok.select(adcSum(col("codes"), col("tbl"), k)).head().getDouble(0)
      === 1.5)
    val bad = Seq((Array(0, 4, 1), Array.fill(3 * k)(0.5)))
      .toDF("codes", "tbl")
    val e = intercept[Exception] {
      bad.select(adcSum(col("codes"), col("tbl"), k)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("out of range")),
      s"expected loud out-of-range failure, got: $e")
  }

  test("ADC lookup-table scoring matches reconstruct-and-dot recall") {
    // v15's scoring path computes q·coarse + Σ table[codes] with
    // stored norms — the same quantity as reconstruct-then-dot up to
    // float-summation grouping. On deterministic testdata the top-k
    // sets and therefore the recall must come out identical (pinned;
    // a divergence means the ADC table or the stored norm is wrong,
    // not noise).
    import graft.operators.IvfPq
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 5)
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 16, coarseIters = 2, m = 8, k = 64, pqIters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-adc").toString
    try {
      IvfPq.index(e, "vec_id", "embedding", model, withNorm = true)
        .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/index")
      val idx = spark.read.parquet(s"$dir/index")
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recon = ids(IvfPq.searchIndex(queries, idx, "vec_id",
        "embedding", model, 10, 8))
      val adc = ids(IvfPq.searchIndexAdc(queries, idx, "vec_id",
        "embedding", model, 10, 8))
      assert(adc === recon,
        s"ADC and reconstruct top-k diverge: only-adc=${adc -- recon}, " +
          s"only-recon=${recon -- adc}")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }
}
