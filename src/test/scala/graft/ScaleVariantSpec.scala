package graft

import org.apache.spark.sql.functions._

/** The explicit 100 TB scale variants (SURVEY.md §2.5/§4): bucketing
  * for shuffle-free co-located joins, and approx_count_distinct as the
  * HLL upgrade of the exact countDistinct. */
class ScaleVariantSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
    o.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_bkt")
    c.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_bkt")

    val joined = spark.table("orders_bkt")
      .join(spark.table("customer_bkt"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not re-shuffle either bucketed side: the only
    // allowed exchange is the one feeding the final aggregation
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
      !joinPart.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // same result as the plain join
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("c_mktsegment").collect()
      === plain.orderBy("c_mktsegment").collect())
  }

  test("approx_count_distinct stays within 5% of exact at sf0.01") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val (exact, approx) = li.agg(
      countDistinct(col("l_orderkey")).as("e"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)).head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
