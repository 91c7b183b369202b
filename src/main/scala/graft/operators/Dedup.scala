package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline extension surface (SURVEY.md §7.4; the
  * reference's own dedup is a driver-side python loop,
  * `notebooks/github_data_ingestion.py:199-219` — here each strategy is a
  * distributed dataflow).
  *
  * Scale design notes (100 TB):
  *   - exact dedup is one hash-shuffle on the digest (map-side partial
  *     aggregation makes the shuffle carry one row per distinct digest
  *     per partition);
  *   - MinHash/LSH bounds pair generation to same-band buckets instead of
  *     the O(n²) cross join;
  *   - every hash is derived from md5 of the content, so signatures are
  *     deterministic across runs, engines, and partitionings — no seed
  *     state on executors.
  */
object Dedup {

  /** Exact dedup keyed by content digest: keep the minimum id per
    * distinct key — deterministic, unlike `dropDuplicates` which keeps an
    * arbitrary first row per key. One shuffle.
    */
  def exactByDigest(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word k-shingles per document: (id, shingle) rows.
    * Documents shorter than k words yield no shingles.
    *
    * `dedupe = false` skips the distinct() shuffle — correct whenever the
    * consumer is idempotent over duplicate shingles (MinHash `min`,
    * `collect_set`); only per-shingle *counts* (d2's common/|A| arithmetic)
    * need true set rows.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
      carry: Seq[String] = Nil, dedupe: Boolean = true): DataFrame = {
    // bind the token array once — element_at inside the lambda must hit
    // the already-split array, not re-split the string per element
    val toks = df.withColumn("__toks", split(col(textCol), " "))
    val grams = when(size(col("__toks")) >= k,
      expr(s"""transform(sequence(1, size(__toks) - ${k - 1}),
                i -> concat_ws(' ', ${(0 until k).map(j => s"element_at(__toks, i + $j)").mkString(", ")}))"""))
      .otherwise(array())
    val rows = toks.select(
      (col(idCol) +: carry.map(col)) :+ explode(grams).as("shingle"): _*)
    if (dedupe) rows.distinct() else rows
  }

  /** MinHash signatures from shingle rows: `numHashes` hash functions,
    * each the lexicographic min of a 8-hex-char (32-bit) slice of
    * `md5(seed || '|' || shingle)` — four hashes per md5 call, so the
    * dominant cost (md5 over every shingle) is numHashes/4 digests
    * instead of numHashes. Purely aggregative — one shuffle on the id,
    * no per-executor state, identical results on any cluster layout.
    */
  def minhashSignatures(shingleRows: DataFrame, idCol: String, numHashes: Int = 8): DataFrame = {
    val aggs = (0 until numHashes).map { i =>
      val seed = i / 4
      val off = (i % 4) * 8 + 1
      min(substring(md5(concat(lit(s"$seed|"), col("shingle"))), off, 8)).as(s"mh$i")
    }
    shingleRows.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Shuffle-free MinHash signatures: the whole signature computed as
    * one narrow map-side expression per document
    * ([[graft.functions.MinHashSignature]]) — identical results to
    * [[minhashSignatures]] with NO shingle explode and NO shuffle. At
    * 100 TB this is the shape to use when only signatures are needed
    * (LSH banding); keep the shingle-row path when exact Jaccard
    * verification needs the shingle sets anyway. Documents shorter than
    * k words are dropped (as the aggregation form does). */
  def minhashSignaturesNarrow(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8): DataFrame = {
    val sig = graft.functions.MinHashSignature.minhashSig(col(textCol), numHashes)
    df.select(col(idCol), sig.as("__sig"))
      .filter(size(col("__sig")) > 0)
      .select(col(idCol) +:
        (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"mh$i")): _*)
  }

  /** LSH banding: rows (id, band, key) where key is the digest of `rowsPerBand`
    * adjacent minhashes. Two documents land in the same (band, key) bucket
    * iff a band of their signatures agrees — candidate pair generation is
    * then a per-bucket join instead of an all-pairs product.
    */
  def lshBands(sigs: DataFrame, idCol: String, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("key"))
    }
    sigs.select(col(idCol), explode(array(bands: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
      .distinct()
  }

  /** Candidate pairs (a < b) sharing at least one LSH bucket.
    *
    * Hot-bucket guard: a dup-heavy corpus is the NORMAL dedup input, and
    * a million near-identical docs land in one (band, key) bucket — the
    * within-bucket join would go quadratic inside that bucket even
    * though the plan is a hash join. Buckets larger than `maxBucket`
    * switch from all-pairs to a HUB STAR (every member paired with the
    * bucket's min id): O(n) pairs instead of O(n²), and — because the
    * downstream consumer is verify → cluster — connectivity through the
    * hub keeps the cluster intact, which is exactly what an oversized
    * bucket (a massive near-dup cluster) means semantically. One extra
    * hash-agg (bucket sizes), join shapes unchanged. */
  def lshCandidatePairs(bandRows: DataFrame, idCol: String,
      maxBucket: Int = 4096): DataFrame = {
    // persisted: bandRows feeds the size aggregate, both all-pairs join
    // sides, and the star branch — callers typically pass the raw
    // minhash→band pipeline, which would otherwise recompute per
    // reference (the [[graft.operators.Similarity.nearDupPairsBanded]]
    // pattern; the bench clears the cache per query)
    val bands = bandRows.persist()
    val sizes = bands.groupBy("band", "key")
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__hub"))
    val tagged = bands.join(sizes, Seq("band", "key"))
    val small = tagged.filter(col("__n") <= maxBucket)
    val l = small.select(col("band"), col("key"), col(idCol).as("id_a"))
    val r = small.select(col("band"), col("key"), col(idCol).as("id_b"))
    val allPairs = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val starPairs = tagged
      .filter(col("__n") > maxBucket && col(idCol) =!= col("__hub"))
      .select(col("__hub").as("id_a"), col(idCol).as("id_b"))
    allPairs.union(starPairs).distinct()
  }

  /** Exact Jaccard similarity for given candidate pairs, from the same
    * shingle rows: |A∩B| / (|A| + |B| - |A∩B|). The shingle rows are
    * collapsed to one set-array per document, so scoring a pair is two
    * hash-join lookups plus an `array_intersect` — the exploded
    * re-join (candidates × every shingle of both sides) is avoided.
    *
    * The set collapse runs ONLY for documents that appear in some pair:
    * Catalyst cannot push the pair semi-join below the collect_set
    * aggregate, so it is applied explicitly — candidate-touched docs
    * are a small fraction of the corpus in a typical dedup run, and
    * collapsing the rest would be the dominant (wasted) cost. `pairs`
    * and the collapsed sets each feed two joins, so both persist for
    * the duration of the plan.
    */
  def jaccardOnPairs(shingleRows: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val p = pairs.persist()
    val ids = p.select(col("id_a").as(idCol))
      .unionByName(p.select(col("id_b").as(idCol)))
      .distinct()
    val sets = shingleRows.join(ids, Seq(idCol), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_set(col("shingle")).as("sh_set"))
      .persist()
    p
      .join(sets.select(col(idCol).as("id_a"), col("sh_set").as("sa")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("sh_set").as("sb")), "id_b")
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("n_a", size(col("sa")).cast("long"))
      .withColumn("n_b", size(col("sb")).cast("long"))
      .withColumn("jaccard",
        col("common") / (col("n_a") + col("n_b") - col("common")))
      .drop("sa", "sb")
  }

  /** Duplicate clusters from verified near-dup pairs: connected
    * components by iterative min-label propagation. Each round joins the
    * (bidirectional) edge list against current labels, takes the min
    * neighbor label per node, and stops at fixpoint — O(diameter)
    * rounds, each one equi-join + hash-agg shuffle. Components produced
    * by near-dup detection have tiny diameters (duplicates of a common
    * original), so a handful of rounds converge; for adversarial
    * long-chain graphs swap in the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce"),
    * which converges in O(log n) rounds with the same join-shape.
    * Deterministic: the representative is the component's min id.
    *
    * Returns (idCol, cluster_rep); nodes without any pair are singleton
    * clusters of themselves.
    */
  /** Corpus rewrite — the dedup ENDGAME after cluster resolution: keep
    * exactly one canonical row per cluster, chosen by `preference`
    * order (e.g. longest text first, then min id for determinism;
    * require a total order). One rank window partitioned by the cluster
    * — clusters from near-dup detection are tiny, so the per-cluster
    * sort is bounded; survivors carry `cluster_size` so downstream can
    * weight or audit the collapse. */
  def keepCanonical(docs: DataFrame, idCol: String, clusters: DataFrame,
      preference: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster_rep").orderBy(preference: _*)
    docs.join(clusters, idCol)
      .withColumn("__rn", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_rep")))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Incremental dedup — the production shape at 100 TB: the corpus is
    * NEVER re-deduped; the daily batch is deduped against a persisted
    * signature INDEX (one row per seen doc: its minhash signature
    * columns mh0..mh{n-1} plus its `cluster_rep`), and against itself.
    * Corpus text is consulted only for docs that appear in some
    * candidate pair (a candidate-bounded point lookup, not a corpus
    * scan); corpus-corpus pairs are never re-verified — they are
    * contracted through the persisted reps.
    *
    * Exactness: the emitted labels equal what a full-corpus
    * [[Graph.connectedComponents]] re-run over corpus ∪ batch would produce.
    * Candidate generation is band-equality in both runs, so the edge
    * set is identical; contracting corpus endpoints to their reps
    * preserves connectivity and minima (every corpus doc ≥ its rep, a
    * component's min is a rep or a batch id); and a batch doc that
    * BRIDGES two existing clusters lowers the larger rep exactly as a
    * re-run would (the mini-clustering runs over batch ids ∪ touched
    * reps only — bounded by the increment, not the corpus).
    *
    * The persisted state is two tables: `corpusSigs` — the signature
    * index, (idCol, mh0..mh{n-1}), one row per signature-bearing seen
    * doc — and `corpusClusters` — the label table, (idCol,
    * cluster_rep) for EVERY seen doc (docs too short to sign are
    * singletons there). Maintain both for the next increment with
    * `Upsert.merge(state, newRows, keys = Seq(idCol))` (exercised in
    * IncrementalDedupSpec).
    *
    * Returns (idCol, cluster_rep) for every corpus AND batch doc.
    */
  def incrementalDedup(corpusSigs: DataFrame, corpusClusters: DataFrame,
      corpusDocs: DataFrame, batchDocs: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5, maxBucket: Int = 4096): DataFrame = {
    // ONE scan of the increment feeds both candidate generation (narrow
    // minhash sigs → bands) and verification (shingle sets): the batch
    // text is read from storage once and every downstream pass works off
    // the persisted (id, text) block — at 100 TB the increment is the
    // frame worth caching, never the corpus
    val batchScan = batchDocs.select(col(idCol), col(textCol)).persist()
    val batchSigs = minhashSignaturesNarrow(batchScan, idCol, textCol, numHashes)
    val batchBands = lshBands(batchSigs, idCol, numHashes, rowsPerBand)
      .persist()
    val indexBands = lshBands(corpusSigs, idCol, numHashes, rowsPerBand)
    // one-sided candidates: batch vs index — the corpus side never
    // self-joins, so the work is proportional to the increment
    // persisted: feeds both the corpus text lookup and verification
    val bc = batchBands.select(col("band"), col("key"), col(idCol).as("id_a"))
      .join(indexBands.select(col("band"), col("key"), col(idCol).as("id_b")),
        Seq("band", "key"))
      .select("id_a", "id_b")
      .distinct()
      .persist()
    val bb = lshCandidatePairs(batchBands, idCol, maxBucket)
    // exact verification shingles: all batch docs + ONLY the corpus
    // docs some candidate touches
    val candCorpus = corpusDocs
      .join(bc.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_semi")
    // persist: jaccardOnPairs joins the collapsed shingle sets on BOTH
    // pair sides, so an unpersisted shingle pipeline would run twice
    val sh = shingles(
      batchScan
        .unionByName(candCorpus.select(col(idCol), col(textCol))),
      idCol, textCol, dedupe = false).persist()
    val verified = jaccardOnPairs(sh, idCol, bc.unionByName(bb))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b")
    // contract corpus endpoints to their persisted reps (batch ids and
    // corpus ids are disjoint, so the lookup misses exactly on id_b in
    // the batch)
    val rep = corpusClusters
      .select(col(idCol).as("id_b"), col("cluster_rep").as("__rep_b"))
    // TRUNCATE (not persist): edges is read by the node set, the
    // mini-clustering, and (via mini) the rep remap — persist would
    // dedup execution but every consumer's LOGICAL plan still embeds
    // the whole candidate+Jaccard subtree once per reference, and the
    // analysis of that duplicated tree (~1.5 s at sf0.1) dominates the
    // steady-state increment. Checkpointing cuts the plan to a
    // LogicalRDD; the upstream scaffolding persists are then released —
    // they exist only to dedup work within this one materialization.
    val edges = graft.spark.Lineage.truncate(
      verified.join(rep, Seq("id_b"), "left")
        .select(col("id_a"), coalesce(col("__rep_b"), col("id_b")).as("id_b")))
    batchScan.unpersist(); batchBands.unpersist()
    bc.unpersist(); sh.unpersist()
    // mini-clustering over the increment only: batch ids + the reps
    // some edge actually touches — bounded by the increment size, never
    // by the corpus (untouched reps cannot change)
    val nodes = batchDocs.select(col(idCol))
      .unionByName(edges.select(col("id_b").as(idCol)))
      .distinct()
    val mini = Graph.connectedComponents(nodes, idCol, edges)
    val batchLabels = mini.join(batchDocs.select(col(idCol)), Seq(idCol), "left_semi")
    // reps lowered by the increment (batch canonical or bridge merge)
    // propagate to every corpus doc they label
    val remap = mini.filter(col("cluster_rep") =!= col(idCol))
      .select(col(idCol).as("__old_rep"), col("cluster_rep").as("__new_rep"))
    val corpusLabels = corpusClusters.select(col(idCol), col("cluster_rep"))
      .join(remap, col("cluster_rep") === col("__old_rep"), "left")
      .select(col(idCol),
        coalesce(col("__new_rep"), col("cluster_rep")).as("cluster_rep"))
    batchLabels.unionByName(corpusLabels)
  }

  /** SimHash near-duplicate pairs: all (a < b) whose signatures are
    * within `maxHamming` bits — *without* the O(n²) cross join.
    *
    * Pigeonhole banding: the `bits`-wide signature is split into
    * `maxHamming + 1` contiguous bit-bands; two signatures within
    * hamming distance r differ in ≤ r bits, so at least one band is
    * untouched — every qualifying pair collides on some (band, bits)
    * bucket. Candidate generation is an equi-join on that bucket key
    * (a plain shuffled hash join that scales out), then the exact
    * xor/popcount check filters false candidates and `distinct`
    * collapses multi-band collisions. With maxHamming = 0 this
    * degenerates to a join on full-signature equality. Shifts are
    * unsigned — bit 63 of a 64-bit signature makes the long negative.
    *
    * Hot-bucket guard (same rationale as [[lshCandidatePairs]]): a
    * (band, bandbits) bucket larger than `maxBucket` — a massive
    * near-identical cluster — emits a hub star (min id vs each member)
    * instead of all pairs, O(n) not O(n²); the exact hamming filter
    * still verifies every emitted pair, and connectivity through the
    * hub keeps downstream clustering intact. */
  def simhashPairs(sigs: DataFrame, idCol: String, maxHamming: Int,
      bits: Int = 64, maxBucket: Int = 4096): DataFrame = {
    val nBands = maxHamming + 1
    // band b covers bit range [lo, hi): unsigned shift + mask
    val bandKeys = (0 until nBands).map { b =>
      val lo = b * bits / nBands
      val hi = (b + 1) * bits / nBands
      val bandbits =
        if (hi - lo >= 64) col("simhash")
        else shiftrightunsigned(col("simhash").cast("long"), lo)
          .bitwiseAND(lit((1L << (hi - lo)) - 1))
      struct(lit(b).as("band"), bandbits.as("bandbits"))
    }
    val banded = sigs.select(col(idCol).as("id"), col("simhash"),
      explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.bandbits"))
      // persisted: feeds the size aggregate, both pair sides, and the
      // star branch — callers pass the raw signature scan, which would
      // otherwise recompute per reference (lshCandidatePairs's pattern)
      .persist()
    val sizes = banded.groupBy("band", "bandbits")
      .agg(count(lit(1)).as("__n"), min(col("id")).as("__hub"),
        min_by(col("simhash"), col("id")).as("__hubsig"))
    val tagged = banded.join(sizes, Seq("band", "bandbits"))
    val small = tagged.filter(col("__n") <= maxBucket)
    val a = small.select(col("band"), col("bandbits"),
      col("id").as("id_a"), col("simhash").as("sig_a"))
    val b = small.select(col("band"), col("bandbits"),
      col("id").as("id_b"), col("simhash").as("sig_b"))
    val allPairs = a.join(b, Seq("band", "bandbits"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
    val starPairs = tagged
      .filter(col("__n") > maxBucket && col("id") =!= col("__hub"))
      .select(col("__hub").as("id_a"), col("id").as("id_b"),
        col("__hubsig").as("sig_a"), col("simhash").as("sig_b"))
    allPairs.union(starPairs)
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  /** Shuffle-free 64-bit SimHash: one narrow map-side expression per
    * document ([[graft.functions.SimHash64]]) — identical results to
    * [[simhash]] at bits=64 with no token explode and no shuffle (the
    * scale shape; equality asserted in DedupSimilaritySpec). */
  def simhashNarrow(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.SimHash64.simhash64(col(textCol)).as("simhash"))

  /** SimHash over the token multiset, `bits` wide (multiple of 16, ≤64;
    * default 64 — a 16-bit signature over a shared vocabulary is too
    * collision-dense to discriminate at any radius). Each token hashes
    * to `bits/16` 16-bit chunks (4 hex chars of its md5 each); per bit
    * the signature takes the sign of Σ(±1). Chunked integer arithmetic
    * throughout — exact, engine-independent, and overflow-free even
    * under ANSI (the only 2^63 term is added last as Long.MinValue,
    * when the positive partial sum is ≤ Long.MaxValue). One explode +
    * one hash-agg.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 64): DataFrame = {
    require(bits > 0 && bits <= 64 && bits % 16 == 0,
      s"bits must be a multiple of 16 in (0, 64], got $bits")
    val toks0 = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", md5(col("w")))
    val toks = (0 until bits / 16).foldLeft(toks0) { (t, c) =>
      t.withColumn(s"v$c", expr(
        s"""(position(substr(h, ${4 * c + 1}, 1) IN '0123456789abcdef') - 1) * 4096
         + (position(substr(h, ${4 * c + 2}, 1) IN '0123456789abcdef') - 1) * 256
         + (position(substr(h, ${4 * c + 3}, 1) IN '0123456789abcdef') - 1) * 16
         + (position(substr(h, ${4 * c + 4}, 1) IN '0123456789abcdef') - 1)"""))
    }
    def bitSum(j: Int): Column =
      sum(when(expr(s"(v${j / 16} div ${1 << (j % 16)}) % 2") === 1, 1)
        .otherwise(-1)).as(s"b$j")
    val bitSums = toks.groupBy(col(idCol))
      .agg(bitSum(0), (1 until bits).map(bitSum): _*)
    bitSums.select(col(idCol),
      (0 until bits).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** Maximum token position per document for the packed (id, pos) key
    * used by [[crossDocDupSpans]] — a document longer than this fails
    * loudly rather than mis-ordering first-occurrence resolution. */
  val MaxSpanPos = 1 << 20

  /** Cross-document EXACT substring deduplication (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): find
    * every n-token span whose text occurs at ≥2 (doc, pos) sites across
    * the whole corpus, keep only the globally FIRST occurrence (min
    * (doc_id, pos)), and merge every other occurrence's overlapping /
    * adjacent windows into maximal duplicated islands
    * `(id, span_start, span_end)` (1-based token positions, end
    * exclusive). This is distinct from whole-document near-dup (d1–d9)
    * and from within-doc repeated spans (t23): it removes the
    * boilerplate / license-header / quoted-chunk text that whole-doc
    * similarity never catches.
    *
    * 100 TB shape — two keyed shuffles, nothing else:
    *  1. window extraction is a narrow map (split → transform →
    *     posexplode), each window carried as its md5 (fixed 32 chars,
    *     never the raw span text);
    *  2. first-occurrence resolution is a partial-aggregating
    *     `groupBy(hash)` (min of a packed (doc,pos) long + count) —
    *     skew-safe: a boilerplate span occurring 10⁸ times map-side
    *     combines before the shuffle;
    *  3. marking duplicates joins occurrences back to that one-row-per-
    *     hash frame — an N:1 equi-join (each window row matches exactly
    *     one hash row, so no fan-out; AQE splits any hot-hash
    *     partition);
    *  4. island merging is one window pass partitioned by doc — the
    *     running-max-end gaps-and-islands form, per-doc data.
    *
    * The packed key `doc_id·2²⁰ + pos` keeps first-occurrence
    * resolution a plain BIGINT `min` on both engines; docs beyond 2²⁰
    * tokens (or ids beyond 2⁴³) would corrupt the ordering, so the
    * operator fails loudly on them (SpanDedupSpec pins the guard).
    */
  def crossDocDupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"span window must be at least 2 tokens, got $n")
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__toks"))
    // one row per n-token window: (id, span_start 1-based, h = md5(span))
    val wins = toks.select(col(idCol),
      posexplode(when(size(col("__toks")) >= n,
        expr(s"""transform(sequence(1, size(__toks) - ${n - 1}),
                 i -> md5(concat_ws(' ', slice(__toks, i, $n))))"""))
        .otherwise(array()))).toDF(idCol, "__p0", "h")
      .select(col(idCol), (col("__p0") + 1).as("span_start"), col("h"))
    val guarded = wins.withColumn("span_start",
      when(col("span_start") < MaxSpanPos && col(idCol) >= 0
          && col(idCol) < (Long.MaxValue / MaxSpanPos), col("span_start"))
        .otherwise(raise_error(concat(lit(
          s"crossDocDupSpans: packed-key bounds exceeded (pos < $MaxSpanPos, 0 <= id < ${Long.MaxValue / MaxSpanPos}) at id="),
          col(idCol).cast("string")))))
    val packed = guarded.withColumn("k",
      col(idCol) * lit(MaxSpanPos.toLong) + col("span_start"))
    val firsts = packed.groupBy("h")
      .agg(min("k").as("__first_k"), count(lit(1)).as("__occ"))
      .filter(col("__occ") >= 2)
      .select("h", "__first_k")
    val dups = packed.join(firsts, "h")
      .filter(col("k") =!= col("__first_k"))
      .select(col(idCol), col("span_start"),
        (col("span_start") + n).as("span_end"))
    // gaps-and-islands: a window starts a new island iff it begins
    // after every previous window's end (adjacency merges: contiguous
    // duplicated text is one island)
    val w = Window.partitionBy(idCol).orderBy("span_start")
    val isl = dups
      .withColumn("__prev_end", max(col("span_end"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new", when(col("__prev_end").isNull ||
        col("span_start") > col("__prev_end"), 1).otherwise(0))
      .withColumn("__island", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col(idCol), col("__island"))
      .agg(min("span_start").as("span_start"), max("span_end").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** The rewrite over [[crossDocDupSpans]]'s islands: drop every token
    * position covered by a duplicated island and reconstruct each
    * document from its kept tokens (single-space joined — the corpus
    * convention every operator here tokenizes by). Islands are exploded
    * to (id, pos) rows — exactly `dup_tokens` rows, bounded by the
    * corpus token count — so the removal is a skew-safe left_anti
    * EQUI-join, never a range join; reconstruction is one per-doc
    * aggregate (array_sort over (pos, token) structs, then join). */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val islands = crossDocDupSpans(docs, idCol, textCol, n)
    val dupPos = islands.select(col(idCol),
      explode(expr("sequence(span_start, span_end - 1)")).as("pos"))
    val toks = docs.select(col(idCol),
      posexplode(split(col(textCol), " "))).toDF(idCol, "__p0", "tok")
      .select(col(idCol), (col("__p0") + 1).as("pos"), col("tok"))
    toks.join(dupPos, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
        .as("text_clean"),
        count(lit(1)).as("n_tokens_clean"))
  }
}
