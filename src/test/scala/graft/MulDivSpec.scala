package graft

import graft.functions.MulDivFunctions
import org.apache.spark.sql.functions._

/** Pins [[graft.functions.MulDiv]] identical to the DECIMAL(38,0)
  * `CAST(a AS DECIMAL(38,0)) * b div c` form it replaces in weighted
  * pagerank — across the long-overflow boundary of a·b and at the
  * pagerank operating range (a ≤ 1e12). */
class MulDivSpec extends SparkSpec {
  import spark.implicits._

  test("mul_div equals the decimal form incl. past the long-product boundary") {
    val rows = Seq(
      (0L, 5L, 3L),
      (7L, 0L, 9L),
      (1000000000000L, 1L, 7L),
      (1000000000000L, 999983L, 31L),          // ~1e18: near the boundary
      // product ~9.2e22 (past Long.MaxValue), quotient back in range —
      // the pagerank domain: weight <= wsum, so quotient <= rank
      (1000000000000L, 92233720368L, 184467440737L),
      (4611686018427387903L, 4L, 5L),          // high bits set
      (123456789L, 987654321L, 1000003L)
    ).toDF("a", "b", "c")
    val out = rows
      .withColumn("viaDecimal", expr("CAST(a AS DECIMAL(38,0)) * b div c"))
      .withColumn("viaMulDiv", MulDivFunctions.mulDiv(col("a"), col("b"), col("c")))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("viaDecimal") === r.getAs[Long]("viaMulDiv"),
        s"mismatch for row $r")
    }
  }

  test("negative operands fail loudly instead of diverging") {
    val ex = intercept[Exception] {
      Seq((-1L, 2L, 3L)).toDF("a", "b", "c")
        .select(MulDivFunctions.mulDiv(col("a"), col("b"), col("c"))).collect()
    }
    assert(ex.getMessage.contains("mul_div") ||
      Option(ex.getCause).exists(_.getMessage.contains("mul_div")))
  }
}
