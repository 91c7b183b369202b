package graft.operators

import graft.functions.{Deterministic, NearestCentroidFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", PAMI 2011) — the memory-bound ANN scale
  * path: each d-dim float vector compresses to m one-byte-ish codes
  * (here 64 floats = 256 bytes → 8 codes), so a 100 TB embedding
  * corpus's index fits in a fraction of the memory while distances are
  * approximated from codeword reconstructions.
  *
  * Spark shape, mirroring [[KMeans]]:
  *   - codebooks live on the driver as m·k·(d/m) floats (model-bounded
  *     — never a function of corpus size) and ship inside codegen'd
  *     [[graft.functions.NearestCentroid]] expressions;
  *   - training is JOINT across subspaces: one explode to
  *     (subspace, subvector) rows, assignment as an m-branch when()
  *     chain of narrow argmin scans, then ONE decimal-deterministic
  *     hash-agg shuffle per Lloyd round for all m codebooks together —
  *     not m separate trainings;
  *   - encode/reconstruct are pure map-side column expressions
  *     (array of per-subspace argmins; flatten of codeword lookups
  *     against a nested-array literal), so the hot path stays inside
  *     whole-stage codegen with zero shuffles.
  *
  * Determinism: seeds are the k vectors whose md5(id) sorts first
  * (KMeans' rule), sums are exact DECIMAL, ties break to the lower
  * code — the whole train→encode→search trajectory is bit-stable
  * under any partitioning, which the v12 gate verdict relies on.
  */
object ProductQuantizer {

  /** codebooks(sub)(code) is a subDim-length centroid. */
  final case class Model(m: Int, k: Int, subDim: Int,
      codebooks: Array[Array[Array[Float]]])

  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, k: Int = 16, iters: Int = 2): Model = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    val sd = dim / m
    val seeds = df
      .select(col(idCol).cast("string").as("__id"), col(vecCol).as("__v"))
      .withColumn("__h", md5(col("__id")))
      .orderBy(col("__h"), col("__id"))
      .limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("__v").toArray)
    require(seeds.length == k, s"need at least $k vectors to seed, got ${seeds.length}")
    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m)(s => seeds.map(v => v.slice(s * sd, (s + 1) * sd)))

    // (subspace, subvector) rows — built once, reused every round
    val subs = df.select(col(vecCol).as("__v"))
      .select(explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS sub, slice(__v, s * $sd + 1, $sd) AS sv))"))
        .as("x"))
      .select(col("x.sub").as("sub"), col("x.sv").as("sv"))

    // reduce side per round is m·k·subDim rows — model-sized, so the
    // Lloyd rounds run under Loop.pinned (see its scaladoc)
    graft.spark.Loop.pinned(df.sparkSession) {
    for (_ <- 1 to iters) {
      val assign = (0 until m).foldLeft(lit(-1)) { (acc, s) =>
        when(col("sub") === s,
          NearestCentroidFunctions.nearestCentroid(col("sv"), books(s)))
          .otherwise(acc)
      }
      // per-(subspace, code) EXACT decimal sums of every sub-dimension
      // as ONE vector aggregate — no posexplode (the exploded form
      // materialized subDim× the subvector rows per Lloyd round; see
      // KMeans.train and graft.functions.DecimalVectorSum for the
      // bit-identical-accumulation argument).
      val stats = subs.withColumn("code", assign)
        .groupBy("sub", "code")
        .agg(graft.functions.VectorAggregates.dsumVec(col("sv"), sd).as("sx"),
          count(lit(1)).as("n"))
        .collect() // ≤ m·k rows — model-bounded
      val next = books.map(_.map(_.clone()))
      stats.foreach { r =>
        val sub = r.getAs[Int]("sub"); val code = r.getAs[Int]("code")
        val n = r.getAs[Long]("n")
        val sx = r.getAs[scala.collection.Seq[Double]]("sx")
        var p = 0
        while (p < sd) {
          next(sub)(code)(p) = (sx(p) / n).toFloat
          p += 1
        }
      }
      books = next // empty codes keep their previous codeword
    }
    }
    Model(m, k, sd, books)
  }

  /** `array<int>` of per-subspace nearest codewords — m narrow argmin
    * scans, fully codegen'd, no shuffle. */
  def encodeCol(vec: Column, model: Model): Column =
    array((0 until model.m).map(s =>
      NearestCentroidFunctions.nearestCentroid(
        slice(vec, s * model.subDim + 1, model.subDim),
        model.codebooks(s))): _*)

  /** Reconstruction from codes: concatenated codeword lookups —
    * `array<float>` ready for the existing cosine machinery. Codegen'd
    * ([[graft.functions.PqCodewords]]); the declarative
    * flatten/transform/element_at form was a CodegenFallback HOF
    * evaluated per scanned row on the PQ search hot path. */
  def reconstructCol(codes: Column, model: Model): Column =
    graft.functions.PqFunctions.pqCodewords(codes, model.codebooks, model.subDim)

  /** End to end: encode the corpus, search the reconstructed vectors
    * with the original query vectors. The corpus side carries only
    * codes past the encode (the memory contract); queries stay exact
    * (asymmetric — the standard ADC setup). */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, model: Model, k: Int): DataFrame = {
    val recon = corpus.select(col(idCol),
      reconstructCol(encodeCol(col(vecCol), model), model)
        .cast("array<float>").as(vecCol))
    Similarity.bruteForceTopK(queries, recon, idCol, vecCol, k)
  }
}
