package graft

import graft.functions.SketchFunctions.cmsEstimate
import org.apache.spark.sql.functions._

/** Count-min-sketch probe (SketchExpressions.scala) + the h1 verdict. */
class SketchSpec extends SparkSpec {

  test("cms_estimate never under-counts and h1's bound holds at sf0.1") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val ev = Tables.events(spark, sf)
      val skRow = broadcast(ev.agg(
        count_min_sketch(col("user_id"), lit(0.0005d), lit(0.99d), lit(42))
          .as("sk"),
        count(lit(1)).as("total")))
      val rows = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .join(skRow)
        .withColumn("est", cmsEstimate(col("sk"), col("user_id")))
        .collect()
      assert(rows.nonEmpty)
      // CMS one-sided guarantee: estimate >= exact, ALWAYS — for every
      // key, not just the heavy band
      assert(rows.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("n")))
      val bound = math.ceil(3 * 0.0005 * rows.head.getAs[Long]("total")).toLong
      val worst = rows.map(r => r.getAs[Long]("est") - r.getAs[Long]("n")).max
      assert(worst <= bound, s"overshoot $worst > bound $bound at $sf")
    }
    // the oracle-gated verdict frame is all-ones
    val h1 = SparkEntry.queries("h1_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect()
    assert(h1.nonEmpty && h1.forall(_.getAs[Int]("within_bound") == 1))
  }

  test("cms_estimate registers for SQL") {
    for (reg <- graft.spark.GraftExtensions.all)
      org.apache.spark.sql.graftbridge.SqlBridge.registerFunction(
        spark, reg._1.funcName, reg._3)
    val r = spark.sql("""
      WITH s AS (SELECT count_min_sketch(id, 0.001d, 0.99d, 1) AS sk
                 FROM VALUES (7L), (7L), (7L), (9L) AS t(id))
      SELECT cms_estimate(sk, 7L) AS c7, cms_estimate(sk, 9L) AS c9 FROM s""")
      .head()
    assert(r.getLong(0) >= 3L && r.getLong(1) >= 1L)
  }
}
