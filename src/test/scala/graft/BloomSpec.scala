package graft

import graft.functions.{BloomFunctions, BloomRuntime}
import org.apache.spark.sql.functions._

/** Bloom-filter build/probe invariants (BloomExpressions.scala) and the
  * b1 runtime-filter composition. */
class BloomSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("no false negatives, deterministic bytes under any partitioning") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => BloomRuntime.mix(i)) // arbitrary longs
    val ds = keys.toDF("k")
    val one = ds.repartition(1)
      .agg(BloomFunctions.bloomAgg(col("k"), 1 << 16, 5)).head().getAs[Array[Byte]](0)
    val many = ds.repartition(8)
      .agg(BloomFunctions.bloomAgg(col("k"), 1 << 16, 5)).head().getAs[Array[Byte]](0)
    // OR-merge over deterministic bit positions → byte-identical filter
    // regardless of partitioning (the hash-compare determinism rule)
    assert(java.util.Arrays.equals(one, many))
    assert(keys.forall(k => BloomRuntime.contains(one, k)))
  }

  test("false-positive rate stays near the sizing formula") {
    val bf = BloomRuntime.alloc(1 << 16, 5)
    (0L until 5000L).foreach(k => BloomRuntime.add(bf, k))
    // theoretical fpr at m=65536, n=5000, k=5 ≈ (1-e^{-kn/m})^k ≈ 0.5%
    val probes = (1000000L until 1020000L)
    val fp = probes.count(k => BloomRuntime.contains(bf, k))
    assert(fp.toDouble / probes.size < 0.02, s"fpr too high: $fp/20000")
  }

  test("bloom prefilter + exact verify == plain semi join; bloom actually prunes") {
    val q = SparkEntry.queries("b1_bloom_semi")(spark, sf).collect()
    val custKeys = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val exact = Tables.orders(spark, sf)
      .join(custKeys, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Deterministic.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority").collect()
    assert(q.toSeq === exact.toSeq)
    // the prefilter must do real work: far fewer rows pass the bloom
    // than exist (1/5 of customers are BUILDING + ~1.6% fp)
    val bf = custKeys
      .agg(BloomFunctions.bloomAgg(col("c_custkey"), 1 << 17, 5))
      .head().getAs[Array[Byte]](0)
    val orders = Tables.orders(spark, sf)
    val kept = orders
      .where(BloomFunctions.bloomContains(lit(bf), col("o_custkey"))).count()
    val total = orders.count()
    val exactKept = orders
      .join(custKeys, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(kept >= exactKept, "bloom can never drop a true match")
    assert(kept < (total * 0.35).toLong,
      s"bloom pruned too little: $kept of $total (exact $exactKept)")
  }

  test("bloom_agg / bloom_contains register for SQL") {
    for (reg <- graft.spark.GraftExtensions.all)
      org.apache.spark.sql.graftbridge.SqlBridge.registerFunction(
        spark, reg._1.funcName, reg._3)
    val r = spark.sql("""
      WITH b AS (SELECT bloom_agg(id, 8192, 5) AS bf
                 FROM VALUES (1L), (2L), (3L) AS t(id))
      SELECT bloom_contains(bf, 2L) AS hit,
             bloom_contains(bf, 999999999L) AS miss
      FROM b""").head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
