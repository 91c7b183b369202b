package graft

import org.apache.spark.sql.functions._

/** Asserts the physical-plan properties the engine relies on at scale:
  * filter/column pushdown into the parquet scan, broadcast joins for
  * dimension tables, partial (map-side) aggregation, and whole-stage
  * codegen coverage. A plan regression here is a 100 TB regression even
  * if results stay correct.
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize the adaptive plan so codegen stages materialize
    df.queryExecution.executedPlan.toString
  }

  test("filters and column pruning push into the parquet scan") {
    val df = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]"),
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>"),
      s"scan must read only needed columns:\n$plan")
  }

  test("dimension joins broadcast, never shuffle the big side") {
    val q = SparkEntry.queries("j2_join_enrich")(spark, sf)
    val plan = planOf(q)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"nation+region must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("rollup aggregation is partial (map-side combine) + final") {
    val q = SparkEntry.queries("a1_rollup")(spark, sf)
    val plan = planOf(q)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expect partial+final hash aggregate:\n$plan")
  }

  test("whole-stage codegen covers the scoring pipeline") {
    val q = SparkEntry.queries("p5_case_tiers")(spark, sf)
    val plan = planOf(q)
    // codegen stages print as "*(n) Operator" in the finalized plan
    assert(plan.contains("*("), s"plan fell out of codegen:\n$plan")
  }

  test("custom dot-product expression participates in codegen") {
    val q = SparkEntry.queries("v2_embedding_neardup")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("dot_product_float"), s"custom expr missing:\n$plan")
    assert(plan.split("\n").exists(l =>
      l.contains("dot_product_float") && l.trim.startsWith("+- *(") ||
        l.contains("dot_product_float") && l.contains("*(")),
      s"custom expr must stay inside a codegen stage:\n$plan")
  }

  test("upsert is a single full-outer shuffle join, no driver collect") {
    for (name <- Seq("k2_upsert", "k8_schema_evolution")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(plan.contains("FullOuter") || plan.contains("SortMergeJoin"),
        s"$name must be a distributed join:\n$plan")
    }
  }

  test("curation pipelines stay on equi-joins, nothing quadratic") {
    for (name <- Seq("cp1_curation_pipeline", "cp2_full_curation")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name fell off the equi-join path:\n$plan")
    }
    // cp2's contamination excision broadcasts the (tiny) eval shingle set
    val cp2 = planOf(SparkEntry.queries("cp2_full_curation")(spark, sf))
    assert(cp2.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n$cp2")
  }

  test("IVF-PQ search never shuffles the index side") {
    // after the index build, search = index scan + broadcast probe join;
    // every Exchange in the plan re-keys QUERY-side frames (probe
    // ranking, final per-query top-k) — a hashpartitioning(list_id) or
    // round-robin Exchange would mean the 100 TB index moved
    import graft.operators.IvfPq
    val e = Tables.embeddings(spark, sf)
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 4, coarseIters = 1, m = 8, k = 8, pqIters = 1)
    val q = IvfPq.topK(e.filter(col("vec_id") < 3), e, "vec_id", "embedding",
      model, 5, nProbe = 2, bounded = true)
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"),
      s"probes must broadcast against the index scan:\n$plan")
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty &&
      exchanges.forall(_.contains("query_id")),
      s"only query-keyed exchanges allowed:\n${exchanges.mkString("\n")}\n$plan")
    assert(!plan.contains("Exchange roundrobin") &&
      !plan.split("\n").exists(l => l.contains("Exchange hashpartitioning(list_id")),
      s"index side must never shuffle:\n$plan")
  }

  test("persisted IVF-PQ index search is partition-pruned to the probed lists") {
    // the v14 steady state: the index is written partitionBy(list_id)
    // and searchIndex turns the probed lists into a literal isin — the
    // scan must show a PartitionFilters entry on list_id (directory
    // pruning: at 100 TB only probed lists are ever read), and the
    // index side must still never shuffle.
    import graft.operators.IvfPq
    val e = Tables.embeddings(spark, sf)
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 4, coarseIters = 1, m = 8, k = 8, pqIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-plan").toString
    try {
      IvfPq.index(e, "vec_id", "embedding", model)
        .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/index")
      val q = IvfPq.searchIndex(e.filter(col("vec_id") < 3),
        spark.read.parquet(s"$dir/index"), "vec_id", "embedding",
        model, 5, nProbe = 2, bounded = true)
      val plan = planOf(q)
      val scanLine = plan.split("\n").find(l =>
        l.contains("PartitionFilters") && l.contains("list_id"))
      assert(scanLine.exists(_.matches(".*PartitionFilters.*list_id.*IN.*")),
        s"index scan must partition-prune on the probed lists:\n$plan")
      assert(!plan.contains("Exchange roundrobin") &&
        !plan.split("\n").exists(l => l.contains("Exchange hashpartitioning(list_id")),
        s"index side must never shuffle:\n$plan")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("rerank fetches the shortlist by broadcast: the corpus never shuffles") {
    // v17's shape: the ADC pass produces a model-bounded shortlist
    // (nQueries·k·refine rows); the true-vector fetch must be a
    // BroadcastHashJoin against the corpus scan — any corpus-side
    // hash Exchange means the rerank re-shuffled 100 TB to fetch a
    // few hundred vectors.
    import graft.operators.IvfPq
    val e = Tables.embeddings(spark, sf)
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 4, coarseIters = 1, m = 8, k = 8, pqIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-rerank").toString
    try {
      IvfPq.index(e, "vec_id", "embedding", model, withNorm = true)
        .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/index")
      val q = IvfPq.searchIndexRerank(e.filter(col("vec_id") < 3),
        spark.read.parquet(s"$dir/index"), e, "vec_id", "embedding",
        model, 5, nProbe = 2, refine = 3, bounded = true)
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"shortlist fetch must broadcast:\n$plan")
      assert(!plan.split("\n").exists(l =>
        l.contains("Exchange hashpartitioning(neighbor_id") ||
          l.contains("Exchange hashpartitioning(vec_id")),
        s"corpus must not shuffle for the rerank fetch:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"no sort-merge anywhere in the rerank path:\n$plan")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("hybrid ANN skips data in both dimensions: partition prune + pushed predicate") {
    // v16's shape: the metadata predicate pushes into the index scan
    // (PushedFilters on the metaCol) UNDER the probed-list partition
    // pruning — neither a corpus semi-join nor an index shuffle.
    import graft.operators.IvfPq
    val e = Tables.embeddings(spark, sf)
    val model = IvfPq.train(e, "vec_id", "embedding", 64,
      nLists = 4, coarseIters = 1, m = 8, k = 8, pqIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-hybrid").toString
    try {
      IvfPq.index(e, "vec_id", "embedding", model, withNorm = true,
        metaCols = Seq("label"))
        .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/index")
      val q = IvfPq.searchIndex(e.filter(col("vec_id") < 3),
        spark.read.parquet(s"$dir/index").filter(col("label") < 5),
        "vec_id", "embedding", model, 5, nProbe = 2, bounded = true)
      val plan = planOf(q)
      val scan = plan.split("\n").find(l =>
        l.contains("PartitionFilters") && l.contains("list_id"))
      assert(scan.exists(_.matches(".*PartitionFilters.*list_id.*IN.*")),
        s"probed-list pruning must survive the predicate:\n$plan")
      assert(plan.split("\n").exists(l =>
        l.contains("PushedFilters") && l.contains("LessThan(label,5)")),
        s"the metadata predicate must push to the index scan:\n$plan")
      assert(!plan.contains("Exchange roundrobin") &&
        !plan.split("\n").exists(l => l.contains("Exchange hashpartitioning(list_id")),
        s"index side must never shuffle:\n$plan")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("top-k ordering compiles to TakeOrderedAndProject, not global sort") {
    val q = SparkEntry.queries("a9_topk_counts")(spark, sf)
    assert(planOf(q).contains("TakeOrderedAndProject"))
  }

  test("bloom prefilter probes map-side, below the exact semi join") {
    val plan = planOf(SparkEntry.queries("b1_bloom_semi")(spark, sf))
    // the probe is a literal-filter Filter on the fact scan — pushdown
    // must place it BELOW the semi join (plan text: printed after),
    // so at scale the bloom thins the rows before any join exchange
    val semiIdx = plan.indexOf("LeftSemi")
    val probeIdx = plan.indexOf("bloom_contains")
    assert(semiIdx >= 0 && probeIdx > semiIdx,
      s"probe must sit under the exact semi join:\n$plan")
    // and it stays inside whole-stage codegen
    assert(plan.split("\n").exists(l =>
      l.contains("bloom_contains") && l.contains("*(")),
      s"probe fell out of codegen:\n$plan")
  }

  test("range join is a hash equi-join on the month bucket, never a nested loop") {
    val q = SparkEntry.queries("j7_range_join")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"),
      s"month-bucket equi-join must hash-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the r2 BNL regression must not return:\n$plan")
  }

  test("dot_product_float registers as a SQL function and stays codegen'd") {
    org.apache.spark.sql.graftbridge.SqlBridge.registerFunction(spark,
      "dot_product_float", args =>
        graft.spark.GraftExtensions.dotProductFloat._3(args))
    // literal arguments constant-fold away (itself proof the expression
    // is first-class Catalyst); check the value on a literal and the
    // plan on a real column
    val lit = spark.sql("""
      SELECT dot_product_float(CAST(array(1.0, 2.0) AS array<float>),
                               CAST(array(3.0, 4.0) AS array<float>)) AS d""")
    assert(lit.head().getDouble(0) === 11.0)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext")
    val df = spark.sql(
      "SELECT dot_product_float(embedding, embedding) AS d FROM emb_ext")
    assert(df.head().getDouble(0) > 0.0)
    val plan = planOf(df)
    assert(plan.contains("dot_product_float"), plan)
  }

  test("every native expression registers for SQL and matches its column API") {
    import graft.spark.GraftExtensions
    for (reg <- GraftExtensions.all)
      org.apache.spark.sql.graftbridge.SqlBridge.registerFunction(
        spark, reg._1.funcName, reg._3)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sqlfn")
    assert(spark.sql(
      "SELECT dot_product_int(array(1, 2), array(3, 4)) AS d")
      .head().getLong(0) === 11L)
    // the aggregate registers too: the analyzer wraps the raw
    // AggregateFunction when used in aggregate context
    val tk = spark.sql("""
      SELECT bounded_topk(CAST(v AS DOUBLE), id, 2) AS tk
      FROM VALUES (1L, 10.0), (2L, 30.0), (3L, 20.0) AS t(id, v)""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getDouble(0), r.getLong(1))) === Seq(
      (30.0, 2L), (20.0, 3L)))
    val viaSql = spark.sql("""
      SELECT doc_id,
             minhash_sig(text) AS mh,
             minhash_sig(text, 8, 3) AS mh83,
             simhash64(text) AS sh,
             topic_lang_matches(split(text, ' ')) AS tl
      FROM docs_sqlfn""")
    val viaCol = Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.MinHashSignature.minhashSig(col("text")).as("mh"),
      graft.functions.MinHashSignature.minhashSig(col("text"), 8, 3).as("mh83"),
      graft.functions.SimHash64.simhash64(col("text")).as("sh"),
      graft.functions.TopicLangMatches.topicLangs(split(col("text"), " ")).as("tl"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    // the narrow signature path must stay inside whole-stage codegen
    // from the SQL front-end too
    val plan = planOf(viaSql)
    for (fn <- Seq("minhash_sig", "simhash64", "topic_lang_matches"))
      assert(plan.contains(fn), s"$fn missing from plan:\n$plan")
    assert(plan.contains("*("), s"plan fell out of codegen:\n$plan")
  }

  test("b1/b2 plan contracts survive AQE re-planning with skew-join handling") {
    // AQE may re-plan every stage at runtime; with skew-join splitting
    // forced, it actively tries to rewrite joins. Neither the bloom
    // probe's position below the semi join (b1) nor the bucketed join's
    // zero-Exchange property (b2) may be casualties of that rewrite.
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try {
      val b1 = planOf(SparkEntry.queries("b1_bloom_semi")(spark, sf))
      val semiIdx = b1.indexOf("LeftSemi")
      val probeIdx = b1.indexOf("bloom_contains")
      assert(semiIdx >= 0 && probeIdx > semiIdx,
        s"AQE re-plan moved the bloom probe above the semi join:\n$b1")
      // materialize the bucketed tables, then pin the BARE join: the
      // join subtree must carry zero Exchange even after skew handling
      SparkEntry.queries("b2_bucketed_join")(spark, sf).collect()
      val suffix = graft.storage.Scratch.fingerprint(sf).take(8)
      val o = graft.storage.Bucketed.read(spark, s"graft_b2_orders_$suffix")
      val c = graft.storage.Bucketed.read(spark, s"graft_b2_customer_$suffix")
      val b2 = planOf(o.hint("merge").join(c, o("o_custkey") === c("c_custkey")))
      assert(b2.contains("SortMergeJoin") && !b2.contains("Exchange"),
        s"bucketed join must stay Exchange-free under AQE skew handling:\n$b2")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("banded near-dup candidate generation never goes quadratic") {
    for (name <- Seq("v6_neardup_lsh", "d6_simhash_pairs", "d7_simhash_radius",
        "d4_lsh_candidates", "v9_self_topk", "v10_self_topk_bounded",
        "c1_contamination")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name must stay an equi-join on the bucket key:\n$plan")
    }
  }

  test("bounded ANN top-k ranks via the heap aggregate: no window, no sim sort") {
    val e = Tables.embeddings(spark, sf)
    val bnd = graft.operators.Similarity.selfTopK(
      e, "vec_id", "embedding", k = 5, dim = 64, bounded = true)
    val plan = planOf(bnd)
    assert(plan.contains("bounded_topk"),
      s"heap aggregate must appear in the plan:\n$plan")
    assert(!plan.contains("Window"),
      s"bounded form must not rank via a window:\n$plan")
    assert(!plan.contains("Sort [sim"),
      s"no candidate may ever be sorted by similarity:\n$plan")
    // the window form DOES sort — the contrast that proves the upgrade
    val win = graft.operators.Similarity.selfTopK(
      e, "vec_id", "embedding", k = 5, dim = 64)
    assert(planOf(win).contains("Window"))
  }

  test("cross-doc span dedup: corpus-scale work is one partial hash-agg + one N:1 join") {
    val docs = Tables.documents(spark, sf)
    val islands = graft.operators.Dedup.crossDocDupSpans(
      docs, "doc_id", "text", n = 8)
    val plan = planOf(islands)
    // first-occurrence resolution must partial-aggregate (map-side
    // combine) — a boilerplate span occurring 10^8 times combines
    // before the shuffle
    assert(plan.contains("partial_min(k#") || plan.contains("partial_min(k "),
      s"span hash-agg must be partial:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"span matching must stay an equi-join:\n$plan")
    // every shuffle is keyed on the span hash or the doc id — no
    // round-robin repartition, no range exchange, nothing carrying raw
    // span text as a partitioning key (windows ride as fixed-width md5)
    val exchanges = "\\bExchange (\\w+)\\(([^,)]+)".r
      .findAllMatchIn(plan.linesIterator.takeWhile(!_.contains("== Initial Plan ==")).mkString("\n"))
      .map(m => (m.group(1), m.group(2))).toList
    assert(exchanges.nonEmpty && exchanges.forall { case (kind, key) =>
      kind == "hashpartitioning" && (key.startsWith("h#") || key.startsWith("doc_id#"))
    }, s"unexpected exchange shape $exchanges in:\n$plan")
  }

  test("bm25: top-k is TakeOrdered and the rank window sees only k rows") {
    val q = SparkEntry.queries("t28_bm25_topk")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must compile to TakeOrdered, not a global sort:\n$plan")
    // the only Window in the plan ranks the k-row post-limit frame:
    // it must sit ABOVE the TakeOrdered, never over the scored corpus
    val winIdx = plan.indexOf("Window")
    val takeIdx = plan.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && takeIdx > winIdx,
      s"rank window must consume the TakeOrdered output (window above, take below):\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1 ||
      "BroadcastExchange".r.findAllIn(plan).size >= 2,
      s"df and corpus stats must broadcast:\n$plan")
  }

  test("scd2: the whole lag→island→collapse→lead chain rides ONE hash exchange") {
    val q = SparkEntry.queries("k9_scd2")(spark, sf)
    val plan = planOf(q)
    val final_ = plan.linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).mkString("\n")
    // both windows partition by user_id and the island groupBy's
    // (user_id, island) keys are clustered by that same partitioning —
    // a second hashpartitioning exchange means the reuse broke
    val hashEx = "Exchange hashpartitioning".r.findAllIn(final_).size
    assert(hashEx == 1,
      s"expected exactly 1 hash exchange (user_id reused end-to-end), got $hashEx:\n$plan")
  }

  test("triangle enumeration is equi-joins only — no cartesian product") {
    val q = SparkEntry.queries("gr3_nation_triangles")(spark, sf)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle closure must stay an equi-join:\n$plan")
  }

  test("containment pairs: df-capped equi-join, no cartesian product") {
    val q = SparkEntry.queries("d16_containment")(spark, sf)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"shingle evidence join must stay an equi-join:\n$plan")
  }

  test("pareto frontier: skyline joins back by broadcast, no O(n^2) dominance join") {
    val q = SparkEntry.queries("a17_pareto_frontier")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"),
      s"size-frame must broadcast back onto the scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("SortMergeJoin"),
      s"skyline must not shuffle or cross-join the big table:\n$plan")
  }

  test("column profile is one scan: a single aggregate over one parquet read") {
    val q = SparkEntry.queries("pr1_column_profile")(spark, sf)
    // AQE's toString repeats the plan under "== Initial Plan ==" — count
    // scans in the final section only
    val plan = planOf(q).split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"profile must read the table exactly once:\n$plan")
    assert(!plan.contains("Join"), s"profile must not self-join:\n$plan")
  }

  test("epoch shuffle prefix is TakeOrdered — the permutation never materializes") {
    val q = SparkEntry.queries("t29_epoch_shuffle")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("TakeOrderedAndProject"),
      s"sort-prefix must compile to a bounded top-k:\n$plan")
  }

  test("snm candidate pairs: neighbor compare is a prefix-partitioned window, no join") {
    val q = SparkEntry.queries("d17_snm_pairs")(spark, sf)
    val plan = planOf(q)
    assert(!plan.contains("Join"),
      s"SNM compares only sort-neighbors via lead windows, never a join:\n$plan")
    assert(plan.contains("Window"), s"expected the lead window:\n$plan")
  }

  test("ts5 global sweep: carry offsets broadcast; no global-sort exchange on the stream") {
    val q = SparkEntry.queries("ts5_global_concurrency")(spark, sf)
    val plan = planOf(q)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"bucket offsets and the max frame must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the boundary stream must never shuffle for a join:\n$plan")
    // the only rangepartitioning(...) allowed is over the tiny
    // bucket-totals frame (the wB window); the data-sized running sum is
    // hashpartitioned by bucket
    assert(plan.contains("hashpartitioning(bucket"),
      s"within-bucket sweep must hash-partition by bucket:\n$plan")
  }

  test("ts1 gap fill: spine explode is narrow; the user window sorts within partitions") {
    val q = SparkEntry.queries("ts1_gap_fill")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("Generate explode"),
      s"spine must come from a narrow sequence+explode:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no calendar cross-join:\n$plan")
  }

  test("ts6 cohort matrix: cohort sizes broadcast back, never shuffled") {
    val q = SparkEntry.queries("ts6_cohort_retention")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"),
      s"cohort-size frame must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("k12 change feed: one shuffle join, no second pass over either side") {
    val q = SparkEntry.queries("k12_change_feed")(spark, sf)
    val plan = planOf(q).split("== Initial Plan ==")(0)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size == 1,
      s"CDF is exactly one full-outer join:\n$plan")
    assert(plan.contains("Generate explode"),
      s"change rows come from a narrow explode:\n$plan")
  }

  test("ts7 rolling distinct: every stage partial-aggregates; bounds broadcast") {
    val q = SparkEntry.queries("ts7_rolling_dau")(spark, sf)
    val plan = planOf(q)
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"user-day distinct and the final count-distinct must both combine map-side:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 1-row bounds frame must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("mergeable sketches (h5/h6) aggregate partially — map-side sketch merge") {
    for (name <- Seq("h5_hll_union", "h6_kll_union")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert("ObjectHashAggregate|SortAggregate|HashAggregate".r
        .findAllIn(plan).size >= 2,
        s"$name: sketch build must partial-aggregate before the exchange:\n$plan")
    }
  }

  test("sql3 recursion executes as a native UnionLoop, not a driver loop") {
    val q = SparkEntry.queries("sql3_recursive_walk")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("UnionLoop"),
      s"WITH RECURSIVE must compile to the native loop operator:\n$plan")
  }

  test("sql4 lateral decorrelates: WindowGroupLimit + pushed correlation, no per-row rerun") {
    val q = SparkEntry.queries("sql4_lateral_top_order")(spark, sf)
    val plan = planOf(q)
    assert(plan.contains("WindowGroupLimit"),
      s"top-1-per-key must be a group limit (map-side partial), not a full rank:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the lateral subquery must join, not nested-loop:\n$plan")
    assert(plan.contains("LessThanOrEqual(o_custkey,200)") ||
      plan.contains("(o_custkey#") && plan.contains("<= 200"),
      s"the correlated filter must push into the orders side:\n$plan")
  }

  test("t30 linear scoring: narrow tokenize + partial aggregate, no join anywhere") {
    val q = SparkEntry.queries("t30_linear_quality")(spark, sf)
    val plan = planOf(q).split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"),
      s"hash-derived weights need no weight-table join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"per-doc sum must combine map-side:\n$plan")
  }
}
