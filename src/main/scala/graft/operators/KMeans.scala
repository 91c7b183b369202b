package graft.operators

import graft.functions.{Deterministic, NearestCentroidFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) over an embedding column — the trained
  * coarse quantizer the IVF index (Similarity.ivfTopK) and the SemDeDup
  * recipe (cluster, then dedup within clusters) both sit on.
  *
  * Spark shape, per iteration:
  *   - centroids live on the driver as k·dim doubles (bounded — 16×64
  *     here; never a function of corpus size) and ship to executors
  *     inside a codegen'd [[NearestCentroid]] expression, so assignment
  *     is a narrow map-side scan: no crossJoin row blowup, no per-row
  *     lambda interpretation;
  *   - the update is ONE hash-agg shuffle: groupBy(assigned cluster) of
  *     per-dimension decimal sums + count. Decimal (order-independent)
  *     accumulation matters here: a float sum's partition-order ulps
  *     would make centroids — and downstream assignments near ties —
  *     run-dependent, which the driver's hash gate would catch.
  *   - empty clusters keep their previous centroid (deterministic).
  *
  * Init is deterministic: the k vectors whose `md5(id)` sort first
  * (id tiebreak), a seeded uniform draw both engines could replay.
  * Inertia (Σ squared distance to the assigned centroid) is decimal-
  * summed per iteration; Lloyd guarantees it non-increasing, which the
  * km1 verdict query gates.
  */
object KMeans {

  /** Training result: per-iteration inertia (index 0 = under the init
    * centroids) and the final centroids, driver-side. */
  final case class Result(
      inertia: Seq[Double],
      centroids: Array[Array[Float]])

  private def vecToArray(row: org.apache.spark.sql.Row, field: String): Array[Float] =
    row.getAs[scala.collection.Seq[Float]](field).toArray

  /** Deterministic seed pick: k vectors in md5(id) order. */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Float]] =
    df.select(col(idCol).cast("string").as("__id"), col(vecCol).as("__v"))
      .withColumn("__h", md5(col("__id")))
      .orderBy(col("__h"), col("__id"))
      .limit(k)
      .collect()
      .map(vecToArray(_, "__v"))

  /** One assignment pass under fixed centroids: adds `cluster_id` (int)
    * and `sq_dist` (double) — fully narrow, codegen'd. */
  def assign(df: DataFrame, vecCol: String,
      cents: Array[Array[Float]]): DataFrame =
    df.withColumn("cluster_id",
        NearestCentroidFunctions.nearestCentroid(col(vecCol), cents))
      .withColumn("sq_dist",
        NearestCentroidFunctions.nearestSqDist(col(vecCol), cents))

  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Result = {
    // one aggregate proves the vector length uniform up front: ragged or
    // empty vectors would silently skew the per-dim means (posexplode
    // emits nothing for an empty vector) and the inertia's /dim rescale
    val dimRange = df.agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    val dim = dimRange.getInt(0)
    require(dim == dimRange.getInt(1) && dim > 0,
      s"$vecCol must be non-empty and uniform-length; " +
        s"saw sizes in [${dimRange.getInt(0)}, ${dimRange.getInt(1)}]")
    var cents = seedCentroids(df, idCol, vecCol, k)
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    // the per-round reduce side is k·dim rows (map-side combine compacts
    // the corpus scan), so Lloyd rounds run under Loop.pinned — see its
    // scaladoc for the measured per-round scheduling constant it removes
    graft.spark.Loop.pinned(df.sparkSession) {
    while (i < iters) {
      val assigned = assign(df, vecCol, cents)
      // one shuffle: per-cluster EXACT decimal sums of every dimension
      // as ONE vector aggregate ([[graft.functions.DecimalVectorSum]])
      // + row count + the global inertia. No posexplode (the exploded
      // form materialized dim× the corpus rows and ran dim redundant
      // decimal sq_dist sums per cluster, every iteration) and no
      // dim-wide aggregate column list (whose per-iteration analysis
      // cost dominated at gate scale). The vector aggregate reproduces
      // the identical per-element decimal cast and exact integer
      // accumulation, so every centroid and inertia value is
      // bit-identical to the exploded form's.
      val stats = assigned
        .groupBy("cluster_id")
        .agg(graft.functions.VectorAggregates.dsumVec(col(vecCol), dim).as("sx"),
          count(lit(1)).as("n"), Deterministic.dsum(col("sq_dist")).as("sd"))
        .collect() // ≤ k rows — model-bounded
        .sortBy(_.getAs[Int]("cluster_id"))
      // inertia: replay the exploded form's driver-side fold exactly —
      // it summed the per-(cluster, pos) sd (the same value dim times
      // per cluster, clusters in ascending order) then divided by dim;
      // the repeated additions keep the float result bit-identical.
      var acc = 0.0
      stats.foreach { r =>
        val sd = r.getAs[Double]("sd")
        var j = 0
        while (j < dim) { acc += sd; j += 1 }
      }
      inertias += acc / dim
      val next = cents.map(_.clone())
      stats.foreach { r =>
        val c = r.getAs[Int]("cluster_id")
        val n = r.getAs[Long]("n")
        val sx = r.getAs[scala.collection.Seq[Double]]("sx")
        var p = 0
        while (p < dim) {
          next(c)(p) = (sx(p) / n).toFloat
          p += 1
        }
      }
      cents = next // clusters with no rows kept their previous value
      i += 1
    }
    // final inertia under the trained centroids
    inertias += assign(df, vecCol, cents)
      .agg(Deterministic.dsum(col("sq_dist"))).head().getDouble(0)
    }
    Result(inertias.toSeq, cents)
  }

  /** Final assignment as a DataFrame (idCol, cluster_id) — the coarse-
    * quantizer label column for ivfTopK or per-cluster dedup. */
  def assignments(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]]): DataFrame =
    assign(df, vecCol, cents).select(col(idCol), col("cluster_id"))
}
