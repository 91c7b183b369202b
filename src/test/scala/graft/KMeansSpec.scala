package graft

import graft.operators.{KMeans, Similarity}
import org.apache.spark.sql.functions._

/** Distributed k-means (operators/KMeans.scala): Lloyd invariants,
  * determinism under partitioning, and IVF-over-trained-centroids
  * recall. */
class KMeansSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("inertia is non-increasing and training strictly improves on the seed") {
    val emb = Tables.embeddings(spark, sf)
    val res = KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 4)
    assert(res.inertia.length == 5)
    res.inertia.sliding(2).foreach { case Seq(prev, cur) =>
      assert(cur <= prev * (1 + 1e-9), s"inertia rose: ${res.inertia}")
    }
    assert(res.inertia.last < res.inertia.head,
      s"training must beat the seed: ${res.inertia}")
    assert(res.centroids.length == 8 && res.centroids.forall(_.length == 64))
  }

  test("assignments are deterministic under any partitioning") {
    val emb = Tables.embeddings(spark, sf)
    val res = KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 3)
    val a1 = KMeans.assignments(emb.repartition(1), "vec_id", "embedding",
      res.centroids).orderBy("vec_id").collect().toSeq
    val a8 = KMeans.assignments(emb.repartition(8), "vec_id", "embedding",
      res.centroids).orderBy("vec_id").collect().toSeq
    assert(a1 == a8)
    // every vector got a legal cluster and every cluster id is in range
    assert(a1.forall { r =>
      val c = r.getAs[Int]("cluster_id"); c >= 0 && c < 8
    })
  }

  test("trained centroids quantize well enough for IVF (recall floor)") {
    val emb = Tables.embeddings(spark, sf)
    val res = KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 4)
    val labeled = emb.join(
      KMeans.assignments(emb, "vec_id", "embedding", res.centroids), "vec_id")
      .withColumn("ivf_label", col("cluster_id").cast("string"))
    val queries = emb.orderBy("vec_id").limit(10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id",
      "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, labeled, "vec_id", "embedding",
      "ivf_label", k = 5, nProbe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low over trained centroids: $recall")
  }

  test("SemDeDup pairs are sound, recall-floored, and the cluster cap fails loudly") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Similarity.semanticDedupPairsKMeans(emb, "vec_id", "embedding",
      threshold = 0.4, k = 4, iters = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness is exact: the within-cluster verify is a true cosine
    assert(sem.subsetOf(exact))
    // recall floor on SYNTHETIC near-uniform vectors (real semantic
    // embeddings cluster far tighter — measured 0.545 here, 0.68 at
    // k=2; the quantizer can only concentrate what the geometry has)
    val recall = (exact & sem).size.toDouble / exact.size
    assert(recall >= 0.45, s"SemDeDup recall regressed: $recall")
    // the scale contract: an oversized cluster must throw, not go
    // quadratic silently
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedupPairsKMeans(emb, "vec_id", "embedding",
        threshold = 0.4, k = 2, iters = 1, maxCluster = 10).count()
    }
    assert(e.getMessage.contains("maxCluster"))
  }

  test("nearest_centroid registers for SQL") {
    for (reg <- graft.spark.GraftExtensions.all)
      org.apache.spark.sql.graftbridge.SqlBridge.registerFunction(
        spark, reg._1.funcName, reg._3)
    val r = spark.sql("""
      SELECT nearest_centroid(CAST(array(0.9, 0.1) AS array<float>),
               CAST(array(array(1.0, 0.0), array(0.0, 1.0))
                 AS array<array<float>>)) AS cid,
             nearest_centroid(CAST(array(0.0, 1.0) AS array<float>),
               CAST(array(array(1.0, 0.0), array(0.0, 1.0))
                 AS array<array<float>>), true) AS dist""").head()
    assert(r.getInt(0) === 0)
    assert(r.getDouble(1) === 0.0)
  }

  test("km1 verdict frame is all-ones") {
    val rows = SparkEntry.queries("km1_kmeans_verdict")(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Int]("monotone") == 1))
  }
}
