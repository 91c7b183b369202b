package graft

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
          graft.operators.Dedup.dedupClusters(
            docs.select(col("doc_id")), "doc_id", pairs).count()
        }
        val clusters = graft.operators.Dedup.dedupClusters(
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
        timed("full_query") {
          SparkEntry.queries("d10_incremental_dedup")(spark, sfDir).count()
        }
      case other =>
        timed("full_query") {
          SparkEntry.queries(other)(spark, sfDir).count()
        }
    }
    spark.stop()
  }
}
