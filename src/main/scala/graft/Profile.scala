package graft

import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the iterative queries — answers "planning
  * or execution?" for drift investigations. Not part of the driver
  * contract; run ad hoc:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile d11"
  *
  * Each stage is timed warm (one untimed run first) so the numbers
  * separate the pipeline's phases under steady-state JIT.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = args.headOption.getOrElse("d11")

    def timed(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    val dim = 64
    which match {
      case "d13" =>
        val docs13 = Tables.documents(spark, sfDir)
        import graft.operators.Dedup
        val sh13 = Dedup.shingles(docs13, "doc_id", "text", dedupe = false)
          .persist()
        val sigs13 = Dedup.minhashSignaturesNarrow(docs13, "doc_id", "text", 8)
        val pairs13 = Dedup.lshCandidatePairs(
          Dedup.lshBands(sigs13, "doc_id", 8, 2), "doc_id")
        timed("verified_pairs") {
          Dedup.jaccardOnPairs(sh13, "doc_id", pairs13)
            .filter(col("jaccard") >= 0.5).count()
        }
        val ver13 = Dedup.jaccardOnPairs(sh13, "doc_id", pairs13)
          .filter(col("jaccard") >= 0.5).select("id_a", "id_b").persist()
        ver13.count()
        timed("star_loop_given_pairs") {
          Graph.connectedComponentsLogN(docs13.select("doc_id"), "doc_id", ver13)
            .count()
        }
        timed("minprop_given_pairs") {
          Graph.connectedComponents(docs13.select("doc_id"), "doc_id", ver13)
            .count()
        }
      case "d11" =>
        val docs = Tables.documents(spark, sfDir)
        timed("pairs_banded") {
          graft.operators.Similarity.nearDupPairsBanded(
            Tables.embeddings(spark, sfDir), "vec_id", "embedding",
            threshold = 0.4, dim = dim).count()
        }
        val pairs = graft.operators.Similarity.nearDupPairsBanded(
          Tables.embeddings(spark, sfDir), "vec_id", "embedding",
          threshold = 0.4, dim = dim)
          .select("id_a", "id_b").persist()
        pairs.count()
        timed("clusters_given_pairs") {
          graft.operators.Graph.connectedComponents(
            docs.select(col("doc_id")), "doc_id", pairs).count()
        }
        val clusters = graft.operators.Graph.connectedComponents(
          docs.select(col("doc_id")), "doc_id", pairs).persist()
        clusters.count()
        timed("canonical_given_clusters") {
          graft.operators.Dedup.keepCanonical(docs, "doc_id", clusters,
            Seq(col("n_chars").desc, col("doc_id")))
            .select("doc_id", "cluster_rep", "n_chars", "cluster_size")
            .orderBy("doc_id").count()
        }
        timed("full_query") {
          SparkEntry.queries("d11_semantic_dedup")(spark, sfDir).count()
        }
      case "v9" =>
        timed("full_query") {
          SparkEntry.queries("v9_self_topk")(spark, sfDir).count()
        }
      case "km1" =>
        timed("train_only") {
          val e = Tables.embeddings(spark, sfDir)
          val res = graft.operators.KMeans.train(e, "vec_id", "embedding", 8, 4)
          res.centroids.length.toLong
        }
        timed("full_query") {
          SparkEntry.queries("km1_kmeans_verdict")(spark, sfDir).count()
        }
      case "d10" =>
        // replicate the query's stage structure to locate the cost;
        // state is assumed already built (run the full query once first)
        SparkEntry.queries("d10_incremental_dedup")(spark, sfDir).count()
        val docs10 = Tables.documents(spark, sfDir)
        val batch = docs10.filter(col("doc_id") % 5 === 0)
        val corpus = docs10.filter(col("doc_id") % 5 =!= 0)
        val suffix = graft.storage.Scratch.fingerprint(sfDir).take(8)
        val stateDir = s"${sys.props("java.io.tmpdir")}/graft_dedup_state_$suffix"
        val csigs = spark.read.parquet(s"$stateDir/sigs")
        val cclusters = spark.read.parquet(s"$stateDir/clusters")
        timed("state_read") { csigs.count() + cclusters.count() }
        timed("batch_bands") {
          graft.operators.Dedup.lshBands(
            graft.operators.Dedup.minhashSignaturesNarrow(
              batch, "doc_id", "text", 8), "doc_id", 8, 2).count()
        }
        timed("incremental_labels") {
          graft.operators.Dedup.incrementalDedup(csigs, cclusters, corpus,
            batch, "doc_id", "text").count()
        }
        val labels10 = graft.operators.Dedup.incrementalDedup(csigs, cclusters,
          corpus, batch, "doc_id", "text").persist()
        labels10.count()
        timed("rewrite_given_labels") {
          graft.operators.Dedup.keepCanonical(docs10, "doc_id", labels10,
            Seq(col("n_chars").desc, col("doc_id")))
            .select("doc_id", "cluster_rep", "n_chars", "cluster_size")
            .orderBy("doc_id").count()
        }
        timed("full_query") {
          SparkEntry.queries("d10_incremental_dedup")(spark, sfDir).count()
        }
      case "d10x" =>
        SparkEntry.queries("d10_incremental_dedup")(spark, sfDir).count()
        val docsx = Tables.documents(spark, sfDir)
        val batchx = docsx.filter(col("doc_id") % 5 === 0)
        val corpusx = docsx.filter(col("doc_id") % 5 =!= 0)
        val sx = graft.storage.Scratch.fingerprint(sfDir).take(8)
        val sd = s"${sys.props("java.io.tmpdir")}/graft_dedup_state_$sx"
        val csx = spark.read.parquet(s"$sd/sigs")
        val ccx = spark.read.parquet(s"$sd/clusters")
        val lx = graft.operators.Dedup.incrementalDedup(csx, ccx, corpusx,
          batchx, "doc_id", "text").persist()
        lx.count()
        timed("labels_cached_count") { lx.count() }
        timed("plan_only") {
          val df = graft.operators.Dedup.keepCanonical(docsx, "doc_id", lx,
            Seq(col("n_chars").desc, col("doc_id")))
          df.queryExecution.executedPlan; 0L
        }
        timed("join_only") { docsx.join(lx, "doc_id").count() }
        timed("rewrite") {
          graft.operators.Dedup.keepCanonical(docsx, "doc_id", lx,
            Seq(col("n_chars").desc, col("doc_id"))).count()
        }
      case "d10y" =>
        SparkEntry.queries("d10_incremental_dedup")(spark, sfDir).count()
        val dy = Tables.documents(spark, sfDir)
        val by = dy.filter(col("doc_id") % 5 === 0)
        val cy = dy.filter(col("doc_id") % 5 =!= 0)
        val sy = graft.storage.Scratch.fingerprint(sfDir).take(8)
        val sdy = s"${sys.props("java.io.tmpdir")}/graft_dedup_state_$sy"
        val csy = spark.read.parquet(s"$sdy/sigs")
        val ccy = spark.read.parquet(s"$sdy/clusters")
        import graft.operators.Dedup
        val bscan = by.select(col("doc_id"), col("text"))
        val bbands = Dedup.lshBands(
          Dedup.minhashSignaturesNarrow(bscan, "doc_id", "text", 8),
          "doc_id", 8, 2)
        val ibands = Dedup.lshBands(csy, "doc_id", 8, 2)
        timed("bc_candidates") {
          bbands.select(col("band"), col("key"), col("doc_id").as("id_a"))
            .join(ibands.select(col("band"), col("key"),
              col("doc_id").as("id_b")), Seq("band", "key"))
            .select("id_a", "id_b").distinct().count()
        }
        val bcy = bbands.select(col("band"), col("key"), col("doc_id").as("id_a"))
          .join(ibands.select(col("band"), col("key"),
            col("doc_id").as("id_b")), Seq("band", "key"))
          .select("id_a", "id_b").distinct().persist()
        bcy.count()
        timed("bb_candidates") {
          Dedup.lshCandidatePairs(bbands, "doc_id").count()
        }
        val bby = Dedup.lshCandidatePairs(bbands, "doc_id")
        val candC = cy.join(bcy.select(col("id_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
        val shy = Dedup.shingles(
          bscan.unionByName(candC.select(col("doc_id"), col("text"))),
          "doc_id", "text", dedupe = false).persist()
        timed("verify_jaccard") {
          Dedup.jaccardOnPairs(shy, "doc_id", bcy.unionByName(bby))
            .filter(col("jaccard") >= 0.5).count()
        }
        timed("full_incremental") {
          Dedup.incrementalDedup(csy, ccy, cy, by, "doc_id", "text").count()
        }
      case other =>
        timed("full_query") {
          SparkEntry.queries(other)(spark, sfDir).count()
        }
    }
    spark.stop()
  }
}
