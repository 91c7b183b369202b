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

  private val sf01 = "/root/testdata/sf0.1"

  test("bounded top-k aggregate equals the rank window and aggregates partially") {
    val w2 = SparkEntry.queries("w2_rank_pergroup")(spark, "/root/testdata/sf0.01")
      .select("c_mktsegment", "seg_rank", "c_custkey")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w10df = SparkEntry.queries("w10_topk_agg")(spark, "/root/testdata/sf0.01")
    val w10 = w10df.select("c_mktsegment", "seg_rank", "c_custkey")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(w10 === w2)
    // the heap aggregate must run partial (map-side) + final — the
    // whole point vs a full sort window
    w10df.collect()
    val plan = w10df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expect partial+final object hash aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no sort window on this path:\n$plan")
  }

  test("a14 sketch rollup stays within 5% of a1's exact distinct per group at sf0.1") {
    val exact = SparkEntry.queries("a1_rollup")(spark, sf01)
      .select("l_returnflag", "l_linestatus", "n_orders").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val approx = Tables.lineitem(spark, sf01)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("a")).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, a) <- approx) {
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"group $k: approx=$a exact=$e")
    }
    // and the gate query's own verdicts hold at 10× the gate's SF
    assert(SparkEntry.queries("a14_approx_rollup")(spark, sf01)
      .collect().forall(_.getAs[Int]("within_tol") == 1))
  }

  test("t14 sketch percentiles stay within 1% of t9's exact selection at sf0.1") {
    val exact = SparkEntry.queries("t9_percentiles")(spark, sf01)
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99")))
      .toMap
    val approx = Tables.orders(spark, sf01)
      .groupBy("o_orderpriority")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("a90"),
        percentile_approx(col("o_totalprice"), lit(0.99), lit(10000)).as("a99"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("a50"), r.getAs[Double]("a90"), r.getAs[Double]("a99")))
      .toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (a50, a90, a99)) <- approx) {
      val (e50, e90, e99) = exact(k)
      for (((a, e), p) <- Seq(a50 -> e50, a90 -> e90, a99 -> e99)
          .zip(Seq("p50", "p90", "p99")))
        assert(math.abs(a - e) / e < 0.01, s"group $k $p: approx=$a exact=$e")
    }
    // and the gate query's own verdicts hold at 10× the gate's SF
    val verdicts = SparkEntry.queries("t14_approx_percentiles")(spark, sf01)
      .collect()
    assert(verdicts.forall(r => r.getAs[Int]("p50_ok") == 1 &&
      r.getAs[Int]("p90_ok") == 1 && r.getAs[Int]("p99_ok") == 1))
  }

  test("bounded selfTopK (v10) equals the rank-window form (v9) row for row") {
    val win = SparkEntry.queries("v9_self_topk")(spark, "/root/testdata/sf0.01")
      .collect().map(_.toSeq)
    val bnd = SparkEntry.queries("v10_self_topk_bounded")(spark, "/root/testdata/sf0.01")
      .collect().map(_.toSeq)
    assert(bnd.length === win.length)
    bnd.zip(win).foreach { case (b, w) => assert(b === w) }
  }

  test("sketch median of document lengths stays within 5% of t7's exact at sf0.1") {
    val exact = SparkEntry.queries("t7_length_median")(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("median_chars")).toMap
    val approx = Tables.documents(spark, sf01)
      .groupBy("lang")
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("m"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("m")).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, a) <- approx) {
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"lang $k: approx=$a exact=$e")
    }
  }
}
