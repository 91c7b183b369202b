package graft

import graft.storage.{ParquetCatalog, SkippingIndex}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** File-level min/max skipping: the index must prune a clustered
  * layout's files on a narrow range predicate, never change results,
  * and degrade to over-reading (not wrong answers) when stats are
  * absent for a column.
  */
class SkippingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshCatalog(): (ParquetCatalog, String) = {
    val root = Files.createTempDirectory("graft-skip").toString
    (new ParquetCatalog(spark, root), root)
  }

  test("range scan over a clustered table reads only intersecting files") {
    val (cat, root) = freshCatalog()
    val orders = Tables.orders(spark, sf)
    cat.overwrite("orders", orders)
    cat.compact("orders", rowsPerFile = 150, clusterBy = Seq("o_orderkey"))
    val dir = s"$root/orders"
    val stats = SkippingIndex.write(spark, dir, Seq("o_orderkey", "o_totalprice"))
    assert(stats.size == cat.fileCount("orders").toInt)
    assert(stats.forall(_.cols.exists(_.column == "o_orderkey")))

    // narrow key range: a clustered layout must prune to a small subset
    val total = stats.size
    val cand = SkippingIndex.candidateFiles(dir, "o_orderkey", 100, 200)
    assert(cand.nonEmpty && cand.size < total,
      s"expected pruning: ${cand.size} of $total files")

    // pruned scan ≡ full-scan filter, row for row
    val pruned = SkippingIndex.scan(spark, dir, "o_orderkey", 100, 200)
    val full = spark.read.parquet(dir)
      .filter(col("o_orderkey") >= 100 && col("o_orderkey") <= 200)
    assert(pruned.count() == full.count())
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("disjoint range yields an empty frame with the table schema") {
    val (cat, root) = freshCatalog()
    cat.overwrite("orders", Tables.orders(spark, sf))
    cat.compact("orders", rowsPerFile = 200, clusterBy = Seq("o_orderkey"))
    val dir = s"$root/orders"
    SkippingIndex.write(spark, dir, Seq("o_orderkey"))
    val out = SkippingIndex.scan(spark, dir, "o_orderkey", -500, -1)
    assert(out.count() == 0)
    assert(out.columns.contains("o_totalprice"))
  }

  test("columns without stats are conservatively kept; index survives reload") {
    val (cat, root) = freshCatalog()
    cat.overwrite("orders", Tables.orders(spark, sf))
    val dir = s"$root/orders"
    SkippingIndex.write(spark, dir, Seq("o_orderkey"))
    val reloaded = SkippingIndex.read(dir)
    // round-trip: same files, same stats
    assert(reloaded == SkippingIndex.collect(spark, dir, Seq("o_orderkey")))
    // predicate on a column the index never collected: nothing pruned
    val all = SkippingIndex.candidateFiles(dir, "o_totalprice", 0, 1)
    assert(all.size == reloaded.size)
  }

  test("z-order layout prunes BOTH predicated columns; linear cluster only the first") {
    def build(zorder: Boolean): (String, Int) = {
      val (cat, root) = freshCatalog()
      cat.overwrite("li", Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_partkey", "l_quantity"))
      if (zorder)
        cat.compact("li", rowsPerFile = 400,
          zorderBy = Seq("l_orderkey", "l_partkey"))
      else
        cat.compact("li", rowsPerFile = 400,
          clusterBy = Seq("l_orderkey"))
      val stats = SkippingIndex.write(spark, s"$root/li",
        Seq("l_orderkey", "l_partkey"))
      (s"$root/li", stats.size)
    }
    val (zdir, zn) = build(zorder = true)
    val (ldir, ln) = build(zorder = false)
    // predicate ONLY on the second z-order column: the lexicographic
    // layout cannot prune it at all, the hypercube layout can
    val preds = Seq(("l_partkey", 1.0, 20.0))
    val zc = SkippingIndex.candidateFilesAll(zdir, preds).size
    val lc = SkippingIndex.candidateFilesAll(ldir, preds).size
    assert(lc == ln, s"linear cluster should not prune the non-leading column ($lc/$ln)")
    assert(zc < zn, s"z-order must prune the second dimension ($zc/$zn)")
    // conjunctive scan ≡ full filter on the z-order layout
    val both = Seq(("l_orderkey", 100.0, 2000.0), ("l_partkey", 1.0, 20.0))
    val pruned = SkippingIndex.scanAll(spark, zdir, both)
    val full = spark.read.parquet(zdir)
      .filter(col("l_orderkey").between(100, 2000) &&
        col("l_partkey").between(1, 20))
    assert(pruned.count() == full.count())
    assert(pruned.exceptAll(full).isEmpty)
  }

  test("numeric predicate over string-typed stats keeps all files, never throws") {
    val (cat, root) = freshCatalog()
    cat.overwrite("orders", Tables.orders(spark, sf))
    val dir = s"$root/orders"
    val stats = SkippingIndex.write(spark, dir, Seq("o_orderstatus")) // BINARY stats
    val cand = SkippingIndex.candidateFiles(dir, "o_orderstatus", 0, 1)
    assert(cand.size == stats.size, "non-numeric stats must conservatively keep")
  }

  test("files appended AFTER the index are conservative candidates — no dropped rows") {
    val (cat, root) = freshCatalog()
    val orders = Tables.orders(spark, sf)
    cat.overwrite("orders", orders.filter(col("o_orderkey") <= 700))
    val dir = s"$root/orders"
    SkippingIndex.write(spark, dir, Seq("o_orderkey"))
    // append rows the stale index has never seen
    cat.append("orders", orders.filter(col("o_orderkey") > 700))
    val pruned = SkippingIndex.scan(spark, dir, "o_orderkey", 500, 1200)
    val full = spark.read.parquet(dir)
      .filter(col("o_orderkey").between(500, 1200))
    assert(pruned.count() == full.count(),
      "stale index must over-read appended files, never drop their rows")
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("numeric-looking STRING stats never prune (lexicographic [10,9] trap)") {
    import spark.implicits._
    val (_, root) = freshCatalog()
    val dir = s"$root/strs"
    // one file whose string min/max are "10"/"9" lexicographically —
    // a numeric read of that interval would wrongly prune lo=9,hi=9
    Seq("9", "10", "11").toDF("v").coalesce(1).write.parquet(dir)
    val stats = SkippingIndex.write(spark, dir, Seq("v"))
    assert(stats.head.cols.head.typ.startsWith("BINARY"))
    val cand = SkippingIndex.candidateFiles(dir, "v", 9, 9)
    assert(cand.size == stats.size, "string-typed stats must keep all files")
    assert(SkippingIndex.scan(spark, dir, "v", 9, 9).count() == 1)
  }

  test("timestamp stats record the FULL annotation; MILLIS files never micros-prune") {
    import spark.implicits._
    val (_, root) = freshCatalog()
    val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2020-06-01 00:00:00")

    // Spark's DEFAULT writer stores TimestampType as INT96 — parquet
    // records no usable stats for it, so such columns are never
    // prunable (conservative by construction)
    val int96Dir = s"$root/ts_int96"
    Seq(t0, t1).toDF("ts").coalesce(1).write.parquet(int96Dir)
    val int96Stats = SkippingIndex.write(spark, int96Dir, Seq("ts"))
    assert(int96Stats.head.cols.isEmpty,
      "INT96 carries no stats — the column must simply be unindexed")

    // opted into TIMESTAMP_MICROS, the annotation records adjusted-UTC
    val microsDir = s"$root/ts_micros"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try Seq(t0, t1).toDF("ts").coalesce(1).write.parquet(microsDir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val microsStats = SkippingIndex.write(spark, microsDir, Seq("ts"))
    assert(microsStats.head.cols.head.typ === "INT64:TIMESTAMP(MICROS,true)",
      "the index must keep unit AND isAdjustedToUTC — pruners opt in per variant")

    // same logical values stored as MILLIS: raw stats are 1000× smaller
    val millisDir = s"$root/ts_millis"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try Seq(t0, t1).toDF("ts").coalesce(1).write.parquet(millisDir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val millisStats = SkippingIndex.write(spark, millisDir, Seq("ts"))
    assert(millisStats.head.cols.head.typ === "INT64:TIMESTAMP(MILLIS,true)")

    // an epoch-MICROS instant window BELOW the data, declared prunable
    // only for the MICROS variant: the micros file prunes, the millis
    // file — whose raw millis stats would "intersect" the micros window
    // 1000× off — must be conservatively KEPT
    val lo = t0.getTime * 1000.0 - 86400e6 * 30
    val hi = t0.getTime * 1000.0 - 86400e6 * 1
    val micros = Set("INT64:TIMESTAMP(MICROS,true)")
    val microsCand = SkippingIndex.candidateFilesTyped(
      java.nio.file.Paths.get(microsDir, "_graft_stats.json"),
      microsStats.map(_.file), Seq(("ts", lo, hi, micros)))
    assert(microsCand.isEmpty, "micros stats prune a disjoint micros window")
    val millisCand = SkippingIndex.candidateFilesTyped(
      java.nio.file.Paths.get(millisDir, "_graft_stats.json"),
      millisStats.map(_.file), Seq(("ts", lo, hi, micros)))
    assert(millisCand === millisStats.map(_.file),
      "MILLIS-stored files must never be pruned by micros bounds")

    // NTZ storage records isAdjustedToUTC=false — a distinct variant
    val ntzDir = s"$root/ts_ntz"
    Seq(java.time.LocalDateTime.of(2020, 1, 1, 0, 0))
      .toDF("ts").coalesce(1).write.parquet(ntzDir)
    val ntzStats = SkippingIndex.write(spark, ntzDir, Seq("ts"))
    assert(ntzStats.head.cols.head.typ === "INT64:TIMESTAMP(MICROS,false)")
  }

  test("pruned scan of a partitioned layout keeps partition columns") {
    val (cat, root) = freshCatalog()
    cat.overwrite("orders",
      Tables.orders(spark, sf)
        .select("o_orderkey", "o_totalprice", "o_orderstatus"),
      partitionBy = Seq("o_orderstatus"))
    val dir = s"$root/orders"
    SkippingIndex.write(spark, dir, Seq("o_orderkey"))
    val pruned = SkippingIndex.scan(spark, dir, "o_orderkey", 100, 200)
    assert(pruned.columns.contains("o_orderstatus"),
      "basePath read must preserve hive-style partition columns")
    val full = spark.read.parquet(dir)
      .filter(col("o_orderkey").between(100, 200))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("refresh is incremental: only new files get footer reads, old entries survive") {
    val (cat, root) = freshCatalog()
    val orders = Tables.orders(spark, sf)
    cat.overwrite("orders", orders.filter(col("o_orderkey") <= 700))
    val dir = s"$root/orders"
    val first = SkippingIndex.write(spark, dir, Seq("o_orderkey"))
    cat.append("orders", orders.filter(col("o_orderkey") > 700))
    val refreshed = SkippingIndex.refresh(spark, dir)
    assert(refreshed.size > first.size, "new files must be indexed")
    // prior entries preserved verbatim (no re-read of known files)
    val byFile = refreshed.map(fs => fs.file -> fs).toMap
    first.foreach(fs => assert(byFile(fs.file) == fs))
    // after refresh the range scan prunes again (all candidates indexed)
    val cand = SkippingIndex.candidateFiles(dir, "o_orderkey", 100, 200)
    assert(cand.size < refreshed.size)
  }

  test("refresh with explicit columns UNIONS the prior index's set, never replaces") {
    // r19 (ADVICE): a table engine-indexed on A whose later
    // `graft.indexFor` declares only B must keep collecting A's stats
    // for NEW files — replacement would permanently degrade skipping
    // and the metadata-aggregate door for everything staged from then
    // on.
    val (cat, _) = freshCatalog()
    val orders = Tables.orders(spark, sf)
    cat.overwriteVersioned("orders", orders.filter(col("o_orderkey") <= 700))
    cat.index("orders", Seq("o_orderkey"))
    cat.setTableProperty("orders",
      graft.storage.ParquetCatalog.IndexForProp, "o_custkey")
    val before = SkippingIndex.readAt(cat.statsPath("orders")).map(_.file).toSet
    cat.appendVersioned("orders", orders.filter(col("o_orderkey") > 700))
    val refreshed = SkippingIndex.readAt(cat.statsPath("orders"))
    val fresh = refreshed.filterNot(fs => before.contains(fs.file))
    assert(fresh.nonEmpty, "the append must index new files")
    fresh.foreach { fs =>
      assert(fs.cols.exists(_.column == "o_custkey"),
        s"appended file ${fs.file} missing the declared column")
      assert(fs.cols.exists(_.column == "o_orderkey"),
        s"appended file ${fs.file} lost the prior indexed column")
    }
  }

  test("unclustered layout prunes little — clustering is what makes stats tight") {
    val (cat, root) = freshCatalog()
    // random layout: hash-repartition, no clustering
    cat.overwrite("orders",
      Tables.orders(spark, sf).repartition(10, col("o_custkey")))
    val dir = s"$root/orders"
    val stats = SkippingIndex.write(spark, dir, Seq("o_orderkey"))
    val cand = SkippingIndex.candidateFiles(dir, "o_orderkey", 100, 200)
    // every hash-partitioned file spans nearly the full key range
    assert(cand.size == stats.size,
      s"random layout should not prune: ${cand.size} of ${stats.size}")
  }

  test("invalid-UTF-8 string stats demote to lossy and never string-prune") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lossy").toString + "/t"
    // 0x41 0xFF is invalid UTF-8: the lossy decode substitutes U+FFFD
    // (bytes EF BF BD), which sorts BELOW the original 0xFF byte — a
    // byte-intersect trusting that max would wrongly drop the file for
    // probes between them
    val hiBytes = Array[Byte](0x41, 0xFF.toByte)
    Seq(Tuple1(Array[Byte](0x41)), Tuple1(hiBytes)).toDF("b")
      .select(col("b").cast("string").as("s"))
      .coalesce(1).write.parquet(dir)
    val stats = SkippingIndex.write(spark, dir, Seq("s"))
    val cs = stats.head.cols.find(_.column == "s").get
    assert(cs.typ == "BINARY:STRING(lossy)", s"got ${cs.typ}")
    // probe ABOVE the lossy-decoded max: the file must survive
    val files = SkippingIndex.listFiles(dir)
    val cand = SkippingIndex.candidateFilesTyped(
      java.nio.file.Paths.get(dir, "_graft_stats.json"), files, Nil,
      strPreds = Seq(("s", Some("A��"), None)))
    assert(cand == files, "lossy string stats must keep the file")
    // and valid-UTF-8 stats still carry the prunable tag
    val dir2 = Files.createTempDirectory("graft-lossy2").toString + "/t"
    Seq("alpha", "omega").toDF("s").coalesce(1).write.parquet(dir2)
    val cs2 = SkippingIndex.write(spark, dir2, Seq("s"))
      .head.cols.find(_.column == "s").get
    assert(cs2.typ == "BINARY:STRING")
  }

  test("decimal bloom probes gate on the chunk's DECIMAL(p,s) annotation") {
    val dir = Files.createTempDirectory("graft-decbloom").toString + "/t"
    spark.range(100).select(col("id").cast("decimal(9,2)").as("d"))
      .coalesce(1).write
      .option("parquet.bloom.filter.enabled#d", "true").parquet(dir)
    val files = SkippingIndex.listFiles(dir)
    // present value (5.00 = unscaled 500) under the matching (9,2): kept
    assert(SkippingIndex.bloomCandidates(spark, files, "d",
      SkippingIndex.DecimalPoint(500L, 9, 2)) == files)
    // absent value under the matching annotation: pruned
    assert(SkippingIndex.bloomCandidates(spark, files, "d",
      SkippingIndex.DecimalPoint(123457L, 9, 2)).isEmpty)
    // same unscaled long at a DIFFERENT scale aliases a different
    // number — the annotation mismatch must keep the file
    assert(SkippingIndex.bloomCandidates(spark, files, "d",
      SkippingIndex.DecimalPoint(123457L, 9, 3)) == files)
    // a plain numeric probe against a DECIMAL-annotated chunk is in
    // different units — refuse (keep), mirroring the min/max tag gate
    assert(SkippingIndex.bloomCandidates(spark, files, "d",
      java.lang.Long.valueOf(123457L)) == files)
  }
}
