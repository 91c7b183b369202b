package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (storage/Bucketed.scala + b2): the join
  * must be Exchange-free and the bucketed write idempotent. */
class BucketedSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed equi-join elides every Exchange; results match plain join") {
    import graft.storage.Bucketed
    val root = java.nio.file.Files.createTempDirectory("graft-b2-spec").toString
    Bucketed.write(spark, Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "b2spec_orders", s"$root/orders", "o_custkey", 4, sf)
    Bucketed.write(spark, Tables.customer(spark, sf)
        .select("c_custkey", "c_mktsegment"),
      "b2spec_customer", s"$root/customer", "c_custkey", 4, sf)
    val o = Bucketed.read(spark, "b2spec_orders")
    val c = Bucketed.read(spark, "b2spec_customer")
    // the JOIN subtree must carry no Exchange at all: both scans are
    // bucketed on the join key, so SortMergeJoin reads them co-located
    val joinPlan = planOf(
      o.hint("merge").join(c, o("o_custkey") === c("c_custkey")))
    assert(joinPlan.contains("SortMergeJoin") &&
      !joinPlan.contains("Exchange") &&
      joinPlan.contains("Bucketed: true"),
      s"bucketed join must be shuffle-free:\n$joinPlan")
    val joined = o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    // with the aggregate on top, the ONLY Exchange is the aggregate's
    // own re-key on c_mktsegment — the join still contributes none
    val plan = planOf(joined)
    assert("Exchange".r.findAllIn(plan).length == 1 &&
      plan.contains("Exchange hashpartitioning(c_mktsegment"),
      s"only the aggregate may shuffle:\n$plan")
    // the co-located result is the plain-join result
    val plain = Tables.orders(spark, sf).join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
  }

  test("rewrite is skipped when the fingerprint is unchanged, redone when it differs") {
    import graft.storage.Bucketed
    val root = java.nio.file.Files.createTempDirectory("graft-b2-fp").toString
    val df = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
    Bucketed.write(spark, df, "b2spec_fp", s"$root/t", "k", 2, "fp1")
    val firstWrite = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$root/t.fingerprint"))
    Bucketed.write(spark, df, "b2spec_fp", s"$root/t", "k", 2, "fp1")
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$root/t.fingerprint")) == firstWrite,
      "unchanged fingerprint must not rewrite")
    Bucketed.write(spark, df, "b2spec_fp", s"$root/t", "k", 2, "fp2")
    assert(Bucketed.read(spark, "b2spec_fp").count() == df.count())
  }

  test("rebuild is atomic: the live table stays readable during the build") {
    import graft.storage.Bucketed
    val root = java.nio.file.Files.createTempDirectory("graft-b2-atomic").toString
    val df = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
    Bucketed.write(spark, df, "b2spec_atomic", s"$root/t", "k", 2, "gen1")
    // a rebuild whose SOURCE reads the table being rebuilt: under the old
    // DROP-then-write scheme the scan finds no table/files mid-build; the
    // side-path build keeps generation 1 fully readable until the
    // metadata-only swap
    val selfRebuild = Bucketed.read(spark, "b2spec_atomic")
      .withColumn("n_name", upper(col("n_name")))
    Bucketed.write(spark, selfRebuild, "b2spec_atomic", s"$root/t", "k", 2, "gen2")
    val out = Bucketed.read(spark, "b2spec_atomic")
    assert(out.count() == df.count())
    assert(out.filter(col("n_name") =!= upper(col("n_name"))).isEmpty,
      "generation 2 (uppercased) must be what the swap published")
    // superseded generation's files are cleaned up: exactly one data dir
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      .toArray.map(_.toString).filter(p => !p.endsWith(".fingerprint"))
    assert(dirs.length == 1, s"stale generation left behind: ${dirs.mkString(",")}")
    // and the rebuilt table still joins Exchange-free on the bucket key
    val o = Bucketed.read(spark, "b2spec_atomic")
    val plan = planOf(o.hint("merge").join(
      o.select(col("k"), col("n_name").as("m")), "k"))
    assert(!plan.contains("Exchange"), s"rebuilt table lost bucketing:\n$plan")
  }

  test("b2 gate query runs green at sf0.001") {
    val rows = SparkEntry.queries("b2_bucketed_join")(spark, sf).collect()
    assert(rows.length == 5) // one per mktsegment
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, sf).join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey")).count())
  }
}
