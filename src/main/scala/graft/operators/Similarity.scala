package graft.operators

import graft.functions.VectorExpressions.dotF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — the
  * approximate-nearest-neighbor extension surface (SURVEY.md §7.4).
  *
  * The dot product is a custom codegen'd Catalyst expression
  * ([[graft.functions.DotProductFloat]]) — Spark's higher-order
  * functions are CodegenFallback and were the all-pairs hot spot.
  * Norms are computed once per vector *before* any join, so an n×m
  * candidate scan does one dot product per pair, not three.
  * Accumulation is left-to-right IEEE double — deterministic and
  * reproducible by the oracle engine.
  *
  * Scale path: `bruteForceTopK` broadcasts the (small) query set and
  * scans the corpus once — at 100 TB the corpus never shuffles; the
  * per-partition top-k is combined by the window over (query, sim).
  * `lshTopK` adds random-hyperplane bucketing so the scan itself shrinks
  * to matching buckets; hyperplanes are derived from md5 so the index is
  * deterministic with no driver-side randomness.
  */
object Similarity {

  /** Cosine similarity between two `array<float>` columns, in double.
    * Division order matches the oracle: dot / ‖a‖ / ‖b‖. */
  def cosine(a: Column, b: Column): Column =
    dotF(a, b) / sqrt(dotF(a, a)) / sqrt(dotF(b, b))

  /** Final per-query top-k over scored candidates
    * (query_id, neighbor_id, sim, ...).
    *
    * `bounded = false`: rank window — sorts EVERY candidate of every
    * query; total-ordered and oracle-exact, but the sort is the scale
    * ceiling. `bounded = true`: the k-bounded heap aggregate
    * ([[graft.functions.BoundedTopK]]) — the partial (map-side)
    * aggregate keeps at most k entries per query per partition, the
    * shuffle carries O(k) rows per query, and nothing is ever sorted
    * beyond the k-element heaps. Output is IDENTICAL: both forms rank
    * by the same (sim DESC, neighbor_id ASC) total order (asserted in
    * ScaleVariantSpec; the no-sort plan shape in PlanSpec). */
  private[operators] def finishTopK(scored: DataFrame, k: Int, bounded: Boolean): DataFrame =
    if (!bounded)
      scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    else
      scored.groupBy("query_id")
        .agg(graft.functions.TopKAggregate.boundedTopK(
          col("sim"), col("neighbor_id"), k).as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("query_id"), col("__e.id").as("neighbor_id"),
          (col("__pos") + 1).cast("int").as("rank"), col("__e.score").as("sim"))

  /** Exact top-k neighbors per query. `queries`/`corpus` must expose
    * (`idCol`, `vecCol`); self-pairs are excluded. The query side is
    * broadcast — the corpus is scanned exactly once, no shuffle of the
    * big side. Ranking is total-ordered (rounded sim desc, neighbor id)
    * so results are reproducible.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bounded: Boolean = false): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(dotF(col("qv"), col("cv")) / col("qn") / col("cn"), 6))
    finishTopK(scored, k, bounded)
  }

  /** Deterministic random-hyperplane sign bit: sign of ⟨v, w⟩ where
    * w_i ∈ {-1,+1} comes from one hex char of md5(plane || i). The
    * hyperplane is a *constant* float array literal, so the projection
    * runs through the codegen'd [[graft.functions.DotProductFloat]]
    * instead of a 64-term expression tree. */
  /** md5-derived ±1 weights for hyperplane `plane` — deterministic, so
    * an oracle rebuilds the identical plane. */
  private def planeWeights(plane: Int, dim: Int): Seq[Float] =
    (0 until dim).map { i =>
      val bit = Integer.parseInt(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$plane|$i").substring(0, 1), 16) % 2
      if (bit == 1) 1.0f else -1.0f
    }

  private def planeDot(vec: Column, plane: Int, dim: Int): Column =
    // ONE array literal, not a 64-element CreateArray: the inline form
    // rebuilt the weight array per row AND blew the generated method
    // past codegen size limits when 16 planes × 64 elements stack up in
    // one projection (the banded paths), dropping whole stages back to
    // interpreted execution. Same floats, same dotF, bit-identical.
    dotF(vec, typedlit(planeWeights(plane, dim)))

  private def planeSign(vec: Column, plane: Int, dim: Int): Column =
    when(planeDot(vec, plane, dim) >= 0, 1).otherwise(0)

  /** Johnson–Lindenstrauss random projection: `outDim` signed-sum
    * projections (the ±1 "database-friendly" JL of Achlioptas 2003)
    * through the codegen'd dot product — a narrow map-side scan that
    * shrinks a 64-dim index 4× before ANN, with distances preserved to
    * O(1/√outDim). The planes are the SAME md5-derived family the LSH
    * bucketer uses, so the projection is deterministic and an oracle
    * replays it exactly; outputs are rounded to 6 dp so both engines
    * emit the identical double. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int): DataFrame =
    df.select(col(idCol) +: (0 until outDim).map(p =>
      round(planeDot(col(vecCol), p, dim), 6).as(s"p$p")): _*)

  /** Approximate top-k: bucket by `nPlanes` hyperplane sign bits, then
    * exact cosine within matching buckets only. Trades recall for a
    * corpus scan that shrinks ~2^nPlanes-fold. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, nPlanes: Int = 4,
      bounded: Boolean = false): DataFrame = {
    def bucket(df: DataFrame) = df.withColumn("bucket",
      (0 until nPlanes).map(p => planeSign(col(vecCol), p, dim) * lit(1 << p))
        .reduce(_ + _))
    val q = bucket(queries).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col("bucket"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val c = bucket(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col("bucket"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(dotF(col("qv"), col("cv")) / col("qn") / col("cn"), 6))
    finishTopK(scored, k, bounded)
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path:
    * a coarse quantizer partitions the corpus into inverted lists, a
    * query probes only the `nProbe` nearest lists, and exact cosine runs
    * inside those lists alone.
    *
    * The coarse quantizer here is the corpus's `labelCol` partition
    * (at scale: any k-means / LSH assignment); list centroids are exact
    * per-dimension means, rounded to 9 dp then cast to float so both
    * engines materialize the identical centroid. The corpus is scanned
    * once and never shuffled — centroids and probe lists are broadcast;
    * only the (probe-bounded) candidate set moves for the final top-k
    * window.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, nProbe: Int,
      bounded: Boolean = false): DataFrame = {
    val cents = corpus
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      // Double sum + round(9), NOT decimal accumulation: float32-derived
      // values are dyadic rationals that can land exactly on decimal .5
      // boundaries, where Spark (HALF_UP) and DuckDB (half-even) break the
      // cast tie differently. Cross-engine ulp noise of the double sum is
      // ~1e-15, six orders below the rounding step — see the identical
      // centroid formula and rationale at v3 (queries/VectorQueries.scala).
      .agg(round(sum(col("x").cast("double")) / count(lit(1)), 9).as("mx"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mx")))),
        s => s.getField("mx")).cast("array<float>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim",
        round(dotF(col("qv"), col("cv")) / col("qn") / sqrt(dotF(col("cv"), col("cv"))), 6))
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("label"))))
      .filter(col("pr") <= nProbe)
      .select("query_id", "label", "qv", "qn")
    val c = corpus.select(col(labelCol).as("label"),
      col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .withColumn("cn", sqrt(dotF(col("nv"), col("nv"))))
    val scored = c.join(broadcast(probes), "label")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(dotF(col("qv"), col("nv")) / col("qn") / col("cn"), 6))
    finishTopK(scored, k, bounded)
  }

  /** Near-duplicate pairs via banded hyperplane LSH — the [[Dedup]]
    * MinHash-band pattern applied to embeddings: `nBands` independent
    * buckets of `planesPerBand` sign bits each; a pair is a candidate iff
    * all signs agree in ≥1 band, then the exact cosine filter verifies.
    * Candidate generation is an equi-join on (band, bucket) — a plain
    * shuffled hash join, no crossJoin — so this is the pairs operator
    * that survives 100×; [[nearDupPairs]] stays as the exact-recall
    * baseline. Planes are md5-derived (band b uses global plane indices
    * b·planesPerBand…), so the index is deterministic and an oracle can
    * rebuild identical buckets. Recall is tunable: P(candidate) =
    * 1-(1-(1-θ/π)^planesPerBand)^nBands, rising steeply with similarity.
    */
  def nearDupPairsBanded(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, nBands: Int = 4,
      planesPerBand: Int = 4, maxBucket: Int = 4096): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bandCols = (0 until nBands).map { bd =>
      struct(lit(bd).as("band"),
        (0 until planesPerBand)
          .map(p => planeSign(col("v"), bd * planesPerBand + p, dim) * lit(1 << p))
          .reduce(_ + _).as("bucket"))
    }
    // persisted: the hyperplane projections feed the bucket-size
    // aggregate AND both pair sides
    val bk = base.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))
      .persist()
    // hot-bucket guard ([[Dedup.lshCandidatePairs]]'s pattern): a
    // (band, bucket) group larger than maxBucket — a massive
    // near-identical cluster, the NORMAL case in a dup-heavy corpus —
    // emits a hub star (min id vs each member) instead of all pairs,
    // O(n) not O(n²); the exact cosine filter still verifies every
    // emitted pair and hub connectivity keeps downstream clustering
    // intact
    val sizes = bk.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__n"), min(col("id")).as("__hub"))
    val tagged = bk.join(sizes, Seq("band", "bucket"))
    val small = tagged.filter(col("__n") <= maxBucket)
    val allPairs = small.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(small.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val starPairs = tagged
      .filter(col("__n") > maxBucket && col("id") =!= col("__hub"))
      .select(col("__hub").as("id_a"), col("id").as("id_b"))
    val pairs = allPairs.union(starPairs).distinct()
    val va = base.select(col("id").as("id_a"), col("v").as("va"))
      .withColumn("na", sqrt(dotF(col("va"), col("va"))))
    val vb = base.select(col("id").as("id_b"), col("v").as("vb"))
      .withColumn("nb", sqrt(dotF(col("vb"), col("vb"))))
    pairs.join(va, "id_a").join(vb, "id_b")
      .withColumn("sim",
        round(dotF(col("va"), col("vb")) / col("na") / col("nb"), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Corpus×corpus approximate top-k — the full-kNN-graph shape
    * (dedup/curation over every document) where the "query set" IS the
    * corpus, so [[bruteForceTopK]]'s broadcast-the-queries contract
    * cannot hold. Candidate generation is [[nearDupPairsBanded]]'s
    * banded hyperplane equi-join on (band, bucket), emitted *directed*
    * (each id is a query of its bucket-mates), then the exact cosine
    * and per-query rank window keep the best `k`. Every stage is an
    * equi-join or hash aggregate — nothing is broadcast, nothing is
    * quadratic, the corpus shuffles by bucket/id only — so the operator
    * scales out with executor count. Ids with no bucket-mates return no
    * rows (ANN semantics); raise `nBands`/lower `planesPerBand` for
    * recall. Deterministic md5 planes → oracle-reproducible. */
  def selfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, nBands: Int = 4, planesPerBand: Int = 4,
      maxBucket: Int = 4096, bounded: Boolean = false): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bandCols = (0 until nBands).map { bd =>
      struct(lit(bd).as("band"),
        (0 until planesPerBand)
          .map(p => planeSign(col("v"), bd * planesPerBand + p, dim) * lit(1 << p))
          .reduce(_ + _).as("bucket"))
    }
    // hot-bucket guard (both paths): unlike the pair-listing paths, a
    // hub star would starve every non-hub query of neighbors, so
    // oversized buckets are SUB-SPLIT instead: members hash
    // (deterministic md5, no rand()) into ceil(n/maxBucket) sub-buckets
    // and candidates form within a sub-bucket only — O(n·maxBucket)
    // candidates, and every query in a near-identical hot bucket still
    // sees ~maxBucket candidates of ~equal similarity, which is what
    // top-k of a dup cluster means. `sizes` is bounded by
    // nBands·2^planesPerBand rows — model-sized, so it BROADCASTS onto
    // the banded rows instead of shuffling them.
    def subCol(nSub: Column): Column =
      when(col("__n") <= maxBucket, lit(0L))
        .otherwise(pmod(
          conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
            .cast("long"), nSub))
    val nSub = greatest(lit(1L),
      ceil(col("__n").cast("double") / maxBucket).cast("long"))
    if (!bounded) {
      // window form (the oracle-gated sibling): banding is NARROW
      // (id, band, bucket) and persisted — it feeds the size aggregate
      // and both candidate sides; candidate pairs dedup before scoring
      // and the vectors re-attach by id (locally a broadcast, at scale
      // the standard pair-by-id shuffle).
      val bk = base.select(col("id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("id"), col("bk.band"), col("bk.bucket"))
        .persist()
      val sizes = bk.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
      val tagged = bk.join(broadcast(sizes), Seq("band", "bucket"))
        .withColumn("sub", subCol(nSub))
      val cand = tagged.select(col("band"), col("bucket"), col("sub"),
          col("id").as("query_id"))
        .join(tagged.select(col("band"), col("bucket"), col("sub"),
          col("id").as("neighbor_id")), Seq("band", "bucket", "sub"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
      val vq = base.select(col("id").as("query_id"), col("v").as("qv"))
        .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
      val vn = base.select(col("id").as("neighbor_id"), col("v").as("nv"))
        .withColumn("nn", sqrt(dotF(col("nv"), col("nv"))))
      val scored = cand.join(vq, "query_id").join(vn, "neighbor_id")
        .withColumn("sim",
          round(dotF(col("qv"), col("nv")) / col("qn") / col("nn"), 6))
      finishTopK(scored, k, bounded = false)
    } else {
      // 100 TB form: the vectors RIDE THROUGH the bucket join, so the
      // candidate stream is scored map-side and collapses straight into
      // the k-bounded heap with in-heap id-dedup (cross-band duplicate
      // pairs score identically) — NOTHING candidate-sized ever
      // shuffles: the only exchanges are the banded rows (corpus×nBands)
      // into the self-join and O(k) heap entries per query out of the
      // partial aggregate.
      val wide = base
        .withColumn("nrm", sqrt(dotF(col("v"), col("v"))))
        .select(col("id"), col("v"), col("nrm"),
          explode(array(bandCols: _*)).as("bk"))
        .select(col("id"), col("v"), col("nrm"), col("bk.band"), col("bk.bucket"))
      val sizes = wide.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
      val tagged = wide.join(broadcast(sizes), Seq("band", "bucket"))
        .withColumn("sub", subCol(nSub))
      val a = tagged.select(col("band"), col("bucket"), col("sub"),
        col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val b = tagged.select(col("band"), col("bucket"), col("sub"),
        col("id").as("neighbor_id"), col("v").as("nv"), col("nrm").as("nn"))
      a.join(b, Seq("band", "bucket", "sub"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim",
          round(dotF(col("qv"), col("nv")) / col("qn") / col("nn"), 6))
        .groupBy("query_id")
        .agg(graft.functions.TopKAggregate.boundedTopK(
          col("sim"), col("neighbor_id"), k, distinctIds = true).as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("query_id"), col("__e.id").as("neighbor_id"),
          (col("__pos") + 1).cast("int").as("rank"), col("__e.score").as("sim"))
    }
  }

  /** All near-duplicate pairs (a < b) with cosine ≥ threshold. Quadratic
    * candidate generation — the exact-recall oracle baseline (RecallSpec
    * grounds every approximate path against it), NOT a production path:
    * `maxExact` fails loudly above the cap — same convention as the LSH
    * hot-bucket caps — pointing at [[nearDupPairsBanded]], so an
    * accidental call on a full corpus cannot silently go O(n²). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxExact: Int = 10000): DataFrame = {
    // limit+count bounds the guard itself: it never materializes more
    // than maxExact+1 rows of a possibly-expensive upstream plan
    val n = df.limit(maxExact + 1).count()
    require(n <= maxExact,
      s"nearDupPairs is the O(n²) exact-recall baseline and got n>" +
        s"maxExact=$maxExact rows — use nearDupPairsBanded (LSH) or " +
        "semanticDedupPairsKMeans for a real corpus, or raise maxExact " +
        "explicitly for a bigger oracle run")
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", sqrt(dotF(col("va"), col("va"))))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", sqrt(dotF(col("vb"), col("vb"))))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(dotF(col("va"), col("vb")) / col("na") / col("nb"), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** SemDeDup as published (Abbas et al. 2023, §3): k-means-cluster the
    * embeddings, then compare pairs ONLY within each cluster — the
    * coarse quantizer bounds candidate generation the way LSH bands do
    * in [[nearDupPairsBanded]], but with a TRAINED partition, which
    * concentrates semantic neighbors far better than data-independent
    * hyperplanes (KMeansSpec measures the recall gap on testdata).
    *
    * Scale contract: within-cluster pairing is quadratic in cluster
    * size, so k must grow with the corpus (the paper uses
    * k ≈ n/5000 at LAION scale — cluster size is a constant you pick,
    * never a function of n). `maxCluster` enforces that contract
    * LOUDLY: a cluster over the cap means the quantizer degenerated
    * (or k was sized wrong), and silently going quadratic inside it is
    * exactly the hot-bucket hazard the LSH paths guard against.
    *
    * Returns verified pairs (id_a < id_b, exact cosine ≥ threshold) —
    * feed to [[Graph.connectedComponents]] + [[Dedup.keepCanonical]] like any
    * other pair source. */
  def semanticDedupPairsKMeans(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int, iters: Int = 4,
      maxCluster: Int = 4096): DataFrame = {
    val res = KMeans.train(df, idCol, vecCol, k, iters)
    val labeled = KMeans.assign(df, vecCol, res.centroids)
      .select(col(idCol), col("cluster_id"), col(vecCol))
    val sizes = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("__cn"))
    val oversized = sizes.filter(col("__cn") > maxCluster).limit(1).collect()
    require(oversized.isEmpty,
      s"cluster ${oversized.headOption.map(_.get(0)).getOrElse("")} exceeds " +
        s"maxCluster=$maxCluster rows — raise k (cluster size must stay " +
        "constant as the corpus grows) or raise the cap explicitly")
    val a = labeled.select(col("cluster_id"), col(idCol).as("id_a"),
      col(vecCol).as("va"))
      .withColumn("na", sqrt(dotF(col("va"), col("va"))))
    val b = labeled.select(col("cluster_id"), col(idCol).as("id_b"),
      col(vecCol).as("vb"))
      .withColumn("nb", sqrt(dotF(col("vb"), col("vb"))))
    a.join(b, Seq("cluster_id")).filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(dotF(col("va"), col("vb")) / col("na") / col("nb"), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
