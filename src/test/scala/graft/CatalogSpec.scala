package graft

import graft.storage.ParquetCatalog
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog = new ParquetCatalog(spark,
    Files.createTempDirectory("graft-cat").toString)

  test("overwrite + read round-trips a partitioned table") {
    val cat = freshCatalog
    val df = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b"))
      .toDF("id", "partition_date", "v")
    cat.overwrite("t", df, Seq("partition_date"))
    val back = cat.read("t")
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("id", "partition_date", "v"))
  }

  test("overwrite is atomic: old data replaced wholesale") {
    val cat = freshCatalog
    cat.overwrite("t", Seq((1L, "a")).toDF("id", "v"))
    cat.overwrite("t", Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
    assert(cat.read("t").orderBy("id").as[(Long, String)].collect()
      === Seq((2L, "b"), (3L, "c")))
  }

  test("dynamic partition overwrite touches only present partitions") {
    val cat = freshCatalog
    cat.overwrite("t",
      Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "partition_date"),
      Seq("partition_date"))
    cat.overwritePartitions("t",
      Seq((99L, "2024-01-02")).toDF("id", "partition_date"),
      Seq("partition_date"))
    val back = cat.read("t").orderBy("id").as[(Long, String)].collect()
    assert(back === Seq((1L, "2024-01-01"), (99L, "2024-01-02")),
      "day 1 untouched, day 2 replaced")
  }

  test("upsert merges into existing table across writes") {
    val cat = freshCatalog
    cat.upsert("t", Seq((1L, "Other", 1.0), (2L, "AI/ML", 2.0))
      .toDF("id", "cat", "m"), Seq("id"))
    cat.upsert("t", Seq((1L, "Web", 10.0), (3L, "Sys", 30.0))
      .toDF("id", "cat", "m"), Seq("id"))
    val back = cat.read("t").orderBy("id").as[(Long, String, Double)].collect()
    assert(back === Seq((1L, "Web", 10.0), (2L, "AI/ML", 2.0), (3L, "Sys", 30.0)))
    // idempotence: re-upserting the same source changes nothing
    cat.upsert("t", Seq((1L, "Web", 10.0), (3L, "Sys", 30.0))
      .toDF("id", "cat", "m"), Seq("id"))
    assert(cat.read("t").orderBy("id").as[(Long, String, Double)].collect() === back)
  }

  test("latest-partition read is partition-pruned") {
    val cat = freshCatalog
    cat.overwrite("t",
      Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-02"))
        .toDF("id", "partition_date"),
      Seq("partition_date"))
    val latest = cat.latestPartition("t", "partition_date")
    assert(latest.select("id").as[Long].collect().sorted === Seq(2L, 3L))
    latest.collect()
    val plan = latest.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(partition_date"),
      s"equality on the partition column must prune:\n$plan")
  }

  /** (path, size, mtime) fingerprint of every data file under a
    * table's partition dirs, keyed by partition value. */
  private def fileFingerprints(cat: ParquetCatalog, root: String,
      name: String): Map[String, Set[(String, Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(root, name)
    val s = Files.walk(base)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map { p =>
        val rel = base.relativize(p).toString
        val part = rel.takeWhile(_ != '/')
        part -> ((rel, Files.size(p), Files.getLastModifiedTime(p).toMillis))
      }.toList.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    finally s.close()
  }

  test("partition-scoped upsert rewrites only touched partitions; parity with full merge") {
    val root = Files.createTempDirectory("graft-psm").toString
    val cat = new ParquetCatalog(spark, root)
    val target = Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0), (4L, "2024-01-03", 4.0))
      .toDF("id", "partition_date", "m")
    cat.overwrite("t", target, Seq("partition_date"))
    val before = fileFingerprints(cat, root, "t")
    // delta touches only 2024-01-02 (update id=3) and 2024-01-04 (insert)
    val delta = Seq((3L, "2024-01-02", 30.0), (9L, "2024-01-04", 90.0))
      .toDF("id", "partition_date", "m")
    cat.upsert("t", delta, Seq("id"), partitionBy = Seq("partition_date"))
    val after = fileFingerprints(cat, root, "t")
    // untouched partitions byte-identical (same files, sizes, mtimes)
    for (p <- Seq("partition_date=2024-01-01", "partition_date=2024-01-03"))
      assert(after(p) === before(p), s"$p must not be rewritten")
    assert(after("partition_date=2024-01-02") !== before("partition_date=2024-01-02"))
    assert(after.contains("partition_date=2024-01-04"))
    // parity with the semantic merge
    val expected = graft.operators.Upsert.merge(target, delta, Seq("id"))
      .select($"id", $"partition_date", $"m")
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(cat.read("t")
      .select($"id", $"partition_date".cast("string"), $"m")
      .orderBy("id").as[(Long, String, Double)].collect()
      === expected)
  }

  test("partition-moving update empties the old slot and removes its dir") {
    val root = Files.createTempDirectory("graft-psm2").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t",
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
        .toDF("id", "partition_date", "m"),
      Seq("partition_date"))
    // id=1 was the ONLY row of 2024-01-01 and the update moves it out
    cat.upsert("t", Seq((1L, "2024-01-05", 10.0)).toDF("id", "partition_date", "m"),
      Seq("id"), partitionBy = Seq("partition_date"))
    val back = cat.read("t")
      .select($"id", $"partition_date".cast("string"), $"m")
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(back === Seq((1L, "2024-01-05", 10.0), (2L, "2024-01-02", 2.0)))
    assert(!Files.exists(java.nio.file.Paths.get(root, "t", "partition_date=2024-01-01")),
      "fully-emptied partition dir must be removed")
  }

  test("partition-scoped delete rewrites only hit partitions, drops emptied dirs") {
    val root = Files.createTempDirectory("graft-psd").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t", Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0), (4L, "2024-01-03", 4.0))
      .toDF("id", "partition_date", "m"), Seq("partition_date"))
    val before = fileFingerprints(cat, root, "t")
    // hits one row of day 1 and ALL of day 2
    val removed = cat.delete("t",
      col("id") === 1L || col("partition_date") === "2024-01-02",
      partitionBy = Seq("partition_date"))
    assert(removed === 2L)
    val after = fileFingerprints(cat, root, "t")
    assert(after("partition_date=2024-01-03") === before("partition_date=2024-01-03"),
      "unhit partition must not be rewritten")
    assert(!after.contains("partition_date=2024-01-02"),
      "fully-deleted partition dir must be removed")
    assert(cat.read("t")
      .select($"id", $"partition_date".cast("string"), $"m")
      .orderBy("id").as[(Long, String, Double)].collect()
      === Seq((2L, "2024-01-01", 2.0), (4L, "2024-01-03", 4.0)))
    // no-hit delete is a no-op returning 0
    assert(cat.delete("t", col("id") === 999L, Seq("partition_date")) === 0L)
  }

  test("index survives the catalog lifecycle: compact re-collects, append refreshes, range read prunes") {
    import graft.storage.SkippingIndex
    val root = Files.createTempDirectory("graft-idx").toString
    val cat = new ParquetCatalog(spark, root)
    val dir = s"$root/t"
    cat.overwrite("t", (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    cat.index("t", Seq("id"))
    // compact into a clustered layout: the index must be RE-collected
    // over the new files automatically (overwrite path)
    cat.compact("t", rowsPerFile = 100, clusterBy = Seq("id"))
    val stats = SkippingIndex.read(dir)
    assert(stats.size == cat.fileCount("t").toInt,
      "compact must leave a fresh index covering exactly the new files")
    // range read through the catalog opens only intersecting files
    assert(SkippingIndex.candidateFiles(dir, "id", 150, 250).size < stats.size)
    val got = cat.readRange("t", Seq(("id", 150.0, 250.0)))
    assert(got.count() == 101)
    // append: incremental refresh — prior entries survive verbatim
    cat.append("t", Seq((5000L, "x")).toDF("id", "v"))
    val after = SkippingIndex.read(dir)
    assert(after.size == stats.size + 1)
    assert(stats.toSet.subsetOf(after.toSet))
    // unindexed fallback: same answers via plain scan + filter
    val cat2root = Files.createTempDirectory("graft-idx2").toString
    val cat2 = new ParquetCatalog(spark, cat2root)
    cat2.overwrite("u", (0 until 100).map(i => (i.toLong, "y")).toDF("id", "v"))
    assert(cat2.readRange("u", Seq(("id", 10.0, 20.0))).count() == 11)
  }

  test("partition-scoped upsert keeps the index reconciled") {
    import graft.storage.SkippingIndex
    val root = Files.createTempDirectory("graft-idx3").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t",
      Seq((1L, "d1", 1.0), (2L, "d2", 2.0)).toDF("id", "day", "m"),
      Seq("day"))
    cat.index("t", Seq("id"))
    cat.upsert("t", Seq((2L, "d2", 20.0), (3L, "d3", 3.0)).toDF("id", "day", "m"),
      Seq("id"), partitionBy = Seq("day"))
    val stats = SkippingIndex.read(s"$root/t")
    assert(stats.size == cat.fileCount("t").toInt,
      "index must cover exactly the post-merge files")
    // every indexed path exists (no stale entries for rewritten d2)
    stats.foreach(fs => assert(Files.exists(java.nio.file.Paths.get(fs.file))))
  }

  test("touched-partition predicate statically prunes the target scan (plan pin)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = Files.createTempDirectory("graft-pp").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t",
      (0 until 12).map(i => (i.toLong, s"d${i % 4}", i * 1.0))
        .toDF("id", "day", "m"),
      Seq("day"))
    // the OR-of-ANDs literal predicate the partition-scoped upsert builds
    val pred = cat.partitionPredicate(Seq("day"), Seq(Seq("d2")))
    val slice = cat.read("t").filter(pred)
    slice.collect()
    val scans = slice.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val planStr = scans.head.toString
    assert(planStr.contains("PartitionFilters:") && planStr.contains("d2"),
      s"predicate must reach PartitionFilters:\n$planStr")
    // the metric proof: only d2's files were opened, not all 4 partitions
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    val d2Files = {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(java.nio.file.Paths.get(root, "t", "day=d2"))
      try s.iterator().asScala.count(p =>
        p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      finally s.close()
    }
    val allFiles = cat.fileCount("t")
    assert(numFiles == d2Files && numFiles < allFiles,
      s"scan opened $numFiles files; d2 has $d2Files of $allFiles total")
  }

  test("partition-scoped upsert and delete handle NULL partition values") {
    val root = Files.createTempDirectory("graft-psnull").toString
    val cat = new ParquetCatalog(spark, root)
    val target = Seq((1L, Some("d1"), 1.0), (2L, None, 2.0), (3L, None, 3.0))
      .toDF("id", "day", "m")
    cat.overwrite("t", target, Seq("day"))
    // update a row in the NULL partition (null-safe <=> matching)
    cat.upsert("t", Seq((2L, Option.empty[String], 20.0)).toDF("id", "day", "m"),
      Seq("id"), partitionBy = Seq("day"))
    val back = cat.read("t")
      .select($"id", $"day".cast("string"), $"m")
      .orderBy("id").as[(Long, Option[String], Double)].collect()
    assert(back === Seq((1L, Some("d1"), 1.0), (2L, None, 20.0), (3L, None, 3.0)))
    // delete everything in the NULL partition: its dir must vanish
    val removed = cat.delete("t", col("day").isNull, Seq("day"))
    assert(removed === 2L)
    assert(!Files.exists(java.nio.file.Paths.get(root, "t",
      "day=__HIVE_DEFAULT_PARTITION__")),
      "emptied default partition dir must be removed")
    assert(cat.read("t").count() === 1)
  }

  test("NULL merge keys match null-safely in the touched-partition probe") {
    val root = Files.createTempDirectory("graft-nullkey").toString
    val cat = new ParquetCatalog(spark, root)
    // key is NOT a partition column; one target row has a NULL key
    cat.overwrite("t",
      Seq((Some(1L), "d1", 1.0), (Option.empty[Long], "d2", 2.0))
        .toDF("k", "day", "m"),
      Seq("day"))
    // the NULL-keyed source row MATCHES the NULL-keyed target row (<=>)
    // and moves it to d3 — the probe must put d2 in the touched set, or
    // the old row survives as a duplicate
    cat.upsert("t", Seq((Option.empty[Long], "d3", 20.0)).toDF("k", "day", "m"),
      Seq("k"), partitionBy = Seq("day"))
    val back = cat.read("t")
      .select($"k", $"day".cast("string"), $"m")
      .orderBy($"k".asc_nulls_last).as[(Option[Long], String, Double)].collect()
    assert(back === Seq((Some(1L), "d1", 1.0), (None, "d3", 20.0)),
      s"NULL-keyed row must be UPDATED (moved), not duplicated: ${back.mkString}")
    assert(!Files.exists(java.nio.file.Paths.get(root, "t", "day=d2")),
      "the NULL-keyed row's old partition must be emptied and dropped")
  }

  test("timestamp partition values render as Spark writes the dirs") {
    import java.sql.Timestamp
    val root = Files.createTempDirectory("graft-tsp").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t",
      Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
        (2L, Timestamp.valueOf("2024-01-02 00:00:00"), 2.0))
        .toDF("id", "ts_p", "m"),
      Seq("ts_p"))
    // the update MOVES id=1 out of its partition: the emptied dir must
    // be found and removed, which requires the computed dir name to
    // match Spark's (java.sql.Timestamp.toString's trailing ".0" does
    // not — the ADVICE r9 defect)
    cat.upsert("t",
      Seq((1L, Timestamp.valueOf("2024-01-03 00:00:00"), 10.0))
        .toDF("id", "ts_p", "m"),
      Seq("id"), partitionBy = Seq("ts_p"))
    import scala.jdk.CollectionConverters._
    val dirs = {
      val s = Files.list(java.nio.file.Paths.get(root, "t"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ts_p=")).toList.sorted
      finally s.close()
    }
    assert(dirs.size == 2 && !dirs.exists(_.contains("2024-01-01")),
      s"emptied timestamp partition dir must be removed; have: $dirs")
    assert(cat.read("t").count() == 2)
  }

  test("a delete that empties every partition leaves a readable schema shell") {
    val root = Files.createTempDirectory("graft-delall").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t", Seq((1L, "d1", 1.0), (2L, "d2", 2.0))
      .toDF("id", "day", "m"), Seq("day"))
    assert(cat.delete("t", lit(true), Seq("day")) === 2L)
    val empty = cat.read("t")
    assert(empty.count() === 0)
    assert(empty.columns.toSet === Set("id", "day", "m"))
    // and the table revives cleanly on the next partition-scoped upsert
    cat.upsert("t", Seq((9L, "d9", 9.0)).toDF("id", "day", "m"),
      Seq("id"), partitionBy = Seq("day"))
    assert(cat.read("t").select($"id").as[Long].collect() === Seq(9L))
  }

  test("append rejects schema drift loudly; evolveSchema unions by name") {
    val cat = freshCatalog
    cat.overwrite("t", Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] {
      cat.append("t", Seq((2L, 5.0)).toDF("id", "w"))
    }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("w") && e.getMessage.contains("v"))
    // explicit evolution: union-by-name, nulls fill both directions
    cat.append("t", Seq((2L, 5.0)).toDF("id", "w"), evolveSchema = true)
    val back = cat.read("t").orderBy("id")
      .select("id", "v", "w").as[(Long, Option[String], Option[Double])].collect()
    assert(back === Seq((1L, Some("a"), None), (2L, None, Some(5.0))))
    // same contract on a versioned table
    cat.overwriteVersioned("u", Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      cat.append("u", Seq((2L, 5.0)).toDF("id", "w"))
    }
    cat.appendVersioned("u", Seq((2L, 5.0)).toDF("id", "w"), evolveSchema = true)
    assert(cat.read("u").columns.toSet === Set("id", "v", "w"))
    assert(cat.read("u").count() === 2)
  }

  test("append rejects a frame with duplicated column names as drift, not a writer crash") {
    val cat = freshCatalog
    cat.overwrite("t", Seq((1L, "a")).toDF("id", "v"))
    // duplicate names collapse in a name->type map: the dedup'd shape
    // matches the table, so only a field-count guard catches it here
    val dup = Seq((2L, "b")).toDF("id", "v").select($"id", $"v", $"v")
    val e = intercept[IllegalArgumentException] { cat.append("t", dup) }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("duplicated in incoming: v"), e.getMessage)
    // same guard on the versioned tier
    cat.overwriteVersioned("u", Seq((1L, "a")).toDF("id", "v"))
    val e2 = intercept[IllegalArgumentException] { cat.appendVersioned("u", dup) }
    assert(e2.getMessage.contains("duplicated in incoming: v"), e2.getMessage)
  }

  test("identical re-append to a string-date-partitioned table succeeds on BOTH tiers") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-ptol").toString
    val cat = new ParquetCatalog(spark, root)
    val frame = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
      .toDF("id", "partition_date", "m")
    // in-place: the string date column reads back as DATE (hive
    // partition-type inference); the identical frame must still append
    cat.overwrite("t", frame, Seq("partition_date"))
    cat.append("t", frame)
    assert(cat.read("t").count() === 4)
    // and it reused the same dirs — no split logical partitions
    val dirs = {
      val s = Files.list(java.nio.file.Paths.get(root, "t"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("partition_date=")).toList.sorted
      finally s.close()
    }
    assert(dirs === List("partition_date=2024-01-01", "partition_date=2024-01-02"))
    // versioned tier: same contract (this is the appendVersioned path)
    cat.overwriteVersioned("u", frame, Seq("partition_date"))
    cat.appendVersioned("u", frame)
    assert(cat.read("u").count() === 4)
  }

  test("appendBatch batch 2 lands on a string-date-partitioned versioned table") {
    val cat = freshCatalog
    val b0 = Seq((1L, "2024-01-01", 1.0)).toDF("id", "partition_date", "m")
    val b1 = Seq((2L, "2024-01-01", 2.0)).toDF("id", "partition_date", "m")
    cat.overwriteVersioned("ev", b0, Seq("partition_date"))
    // batch 2 previously threw a false schema drift (date<-string read-back)
    cat.appendBatch("ev", b1, "ckpt#1")
    assert(cat.read("ev").count() === 2)
    cat.appendBatch("ev", b1, "ckpt#1") // replay stays a no-op
    assert(cat.read("ev").count() === 2)
  }

  test("non-round-trip partition retypes and non-partition retypes still fail loudly") {
    val cat = freshCatalog
    cat.overwrite("t",
      Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("id", "day"),
      Seq("day"))
    // timestamp renders a different dir name than date — must stay loud
    val e = intercept[IllegalArgumentException] {
      cat.append("t",
        Seq((2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
          .toDF("id", "day"))
    }
    assert(e.getMessage.contains("day: date->timestamp"), e.getMessage)
    // a non-partition retype reports ONLY itself: the compatible
    // partition column stays out of the list, empty sections are dropped
    val e2 = intercept[IllegalArgumentException] {
      cat.append("t", Seq(("x", "2024-01-03")).toDF("id", "day"))
    }
    assert(e2.getMessage.contains("id: bigint->string"), e2.getMessage)
    assert(!e2.getMessage.contains("day:") && !e2.getMessage.contains("missing"),
      e2.getMessage)
    // same discipline on the versioned tier
    cat.overwriteVersioned("u",
      Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("id", "day"),
      Seq("day"))
    val e3 = intercept[IllegalArgumentException] {
      cat.appendVersioned("u",
        Seq((2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
          .toDF("id", "day"))
    }
    assert(e3.getMessage.contains("day: date->timestamp"), e3.getMessage)
  }

  test("readPoint prunes with parquet native bloom filters on both tiers") {
    val root = Files.createTempDirectory("graft-bloom")
    val cat = new ParquetCatalog(spark, root.toString,
      bloomFor = Seq("id"), bloomNdv = 10000L)
    // RANDOM (round-robin) layout: every file's [min,max] spans the key
    // space, so min/max stats cannot prune a point probe — only a bloom
    // can say "not in this file"
    val df = (0 until 20000).map(i => (i.toLong, i % 97)).toDF("id", "g")
      .repartition(20)
    cat.overwrite("t", df)
    assert(cat.fileCount("t") >= 10)
    val cand = cat.pointCandidates("t", "id", 12345L)
    assert(cand.nonEmpty && cand.size < cat.fileCount("t") / 2,
      s"bloom must prune most files; kept ${cand.size} of ${cat.fileCount("t")}")
    assert(cat.readPoint("t", "id", 12345L).select("id", "g")
      .as[(Long, Int)].collect() === Array((12345L, 12345 % 97)))
    // a missing key reads empty through the same path
    assert(cat.readPoint("t", "id", 999999L).count() === 0)
    // versioned tier: candidates resolve through the current manifest
    cat.overwriteVersioned("u", df)
    assert(cat.readPoint("u", "id", 777L).select("id").as[Long].collect()
      === Array(777L))
    assert(cat.pointCandidates("u", "id", 777L).size <
      cat.manifest("u", cat.currentVersion("u")).files.size)
    // string keys hash through BINARY
    val cats = new ParquetCatalog(spark,
      Files.createTempDirectory("graft-bls").toString,
      bloomFor = Seq("k"), bloomNdv = 10000L)
    cats.overwrite("s", (0 until 5000).map(i => (s"key-$i", i))
      .toDF("k", "v").repartition(10))
    assert(cats.pointCandidates("s", "k", "key-321").size < 10)
    assert(cats.readPoint("s", "k", "key-321").select("v").as[Int].collect()
      === Array(321))
    // a table written WITHOUT blooms keeps every file (advisory pruning)
    val plain = new ParquetCatalog(spark,
      Files.createTempDirectory("graft-nb").toString)
    plain.overwrite("t", df)
    assert(plain.pointCandidates("t", "id", 12345L).size === plain.fileCount("t"))
    assert(plain.readPoint("t", "id", 12345L).count() === 1)
  }

  test("appends write O(delta) manifest bytes, snapshot every Nth commit, vacuum materializes") {
    val root = Files.createTempDirectory("graft-dm")
    val cat = new ParquetCatalog(spark, root.toString)
    val vd = root.resolve(".versions").resolve("t")
    def manifestText(v: Long) = Files.readString(vd.resolve(s"v$v.manifest"))
    // v1: a snapshot with 30 file entries
    cat.overwriteVersioned("t",
      (1 to 300).map(i => (i.toLong, i * 1.0)).toDF("id", "m").repartition(30))
    assert(cat.manifestFiles("t", 1).size === 30)
    // v2..v10: nine single-file appends, each an O(1)-entry DELTA
    (1 to 9).foreach { i =>
      cat.appendVersioned("t",
        Seq((1000L + i, i * 1.0)).toDF("id", "m").coalesce(1))
    }
    (2L to 10L).foreach { v =>
      val txt = manifestText(v)
      assert(txt.contains(s"base=${v - 1}"), s"v$v must be a delta")
      assert(txt.linesIterator.count(_.startsWith("f ")) === 1,
        s"v$v must list only its own added file")
      assert(Files.size(vd.resolve(s"v$v.manifest")) <
        Files.size(vd.resolve("v1.manifest")),
        s"delta v$v must be smaller than the snapshot")
    }
    // resolution gives full snapshot semantics at every version
    assert(cat.manifestFiles("t", 10).size === 39)
    assert(cat.read("t").count() === 309)
    assert(cat.readVersion("t", 5).count() === 304)
    // the 10th append hits the snapshot interval: self-contained again
    cat.appendVersioned("t", Seq((2000L, 0.0)).toDF("id", "m").coalesce(1))
    val snap = manifestText(11)
    assert(!snap.contains("base="), "every Nth commit must be a snapshot")
    assert(snap.linesIterator.count(_.startsWith("f ")) === 40)
    // vacuum keep=2: v10 is a delta whose base is dropped — it gets
    // materialized in place; both retained versions stay readable
    cat.vacuum("t", keep = 2, minAgeMs = 0L)
    assert(cat.versions("t") === Seq(10L, 11L))
    assert(!manifestText(10).contains("base="),
      "a retained delta must be materialized when its base is vacuumed")
    assert(cat.readVersion("t", 10).count() === 309)
    assert(cat.read("t").count() === 310)
    // and the txn registry still rides resolution: a replayed batch
    // appended through the delta chain stays a no-op
    cat.appendBatch("t", Seq((3000L, 3.0)).toDF("id", "m"), "dm#0")
    val cur = cat.currentVersion("t")
    assert(cat.appendBatch("t", Seq((3000L, 3.0)).toDF("id", "m"), "dm#0") === cur)
  }

  test("mergeInto executes literal MERGE text against catalog tables on both tiers") {
    val cat = freshCatalog
    val target = Seq((1L, "Other", 1.0), (2L, "KEEP", 2.0))
      .toDF("id", "category", "metric")
    val text = (t: String) => s"""
      MERGE INTO $t AS target
      USING src_mi AS source
      ON target.id = source.id
      WHEN MATCHED THEN UPDATE SET
        metric = source.metric,
        category = CASE WHEN target.category = 'Other'
                        THEN source.category ELSE target.category END
      WHEN NOT MATCHED THEN INSERT *"""
    Seq((2L, "NEW", 20.0), (3L, "NEW", 30.0)).toDF("id", "category", "metric")
      .createOrReplaceTempView("src_mi")
    // in-place tier: atomic overwrite write-back
    cat.overwrite("t", target)
    assert(cat.mergeInto(text("t")) === 0L)
    val expected = Seq((1L, "Other", 1.0), (2L, "KEEP", 20.0), (3L, "NEW", 30.0))
    assert(cat.read("t").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq === expected)
    // versioned tier: the merge is an audited commit; v1 stays readable
    cat.overwriteVersioned("u", target)
    assert(cat.mergeInto(text("u")) === 2L)
    assert(cat.read("u").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq === expected)
    assert(cat.history("u").filter(col("version") === 2)
      .select("operation").head().getString(0) === "merge")
    assert(cat.readVersion("u", 1).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "Other", 1.0), (2L, "KEEP", 2.0)))
  }

  test("latestPartitionValue resolves from metadata alone on both tiers") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-lpv")
    val cat = new ParquetCatalog(spark, root.toString)
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
      (3L, "2024-01-03", 3.0)).toDF("id", "day", "m")
    cat.overwrite("t", df, Seq("day"))
    cat.overwriteVersioned("u", df, Seq("day"))
    // corrupt EVERY data file: any resolution path that opens one blows up
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .foreach(p => Files.writeString(p, "garbage"))
    finally s.close()
    assert(cat.latestPartitionValue("t", "day") === Some("2024-01-03"))
    assert(cat.latestPartitionValue("u", "day") === Some("2024-01-03"))
    // a non-partition column has no metadata to answer from
    assert(cat.latestPartitionValue("t", "m") === None)
    assert(cat.latestPartitionValue("u", "m") === None)
  }

  test("latestPartition orders numeric partitions numerically and prunes the scan") {
    val lpRoot = Files.createTempDirectory("graft-lpn")
    val cat = new ParquetCatalog(spark, lpRoot.toString)
    // bucket 10 > bucket 9 numerically; "10" < "9" lexicographically
    val df = (1 to 30).map(i => (i.toLong, i % 3 match {
      case 0 => 2 case 1 => 9 case 2 => 10
    }, i * 1.0)).toDF("id", "bucket", "m")
    cat.overwrite("t", df, Seq("bucket"))
    assert(cat.latestPartitionValue("t", "bucket") === Some("10"))
    val slice = cat.latestPartition("t", "bucket")
    val got = slice.select("id").as[Long].collect().sorted
    assert(got === (1 to 30).filter(_ % 3 == 2).map(_.toLong).toArray)
    // the equality filter statically prunes: the scan opens only the
    // latest partition's files
    slice.collect()
    val scan = slice.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val latestFiles = {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(lpRoot.resolve("t").resolve("bucket=10"))
      try st.iterator().asScala.count(p =>
        p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      finally st.close()
    }
    assert(scan.metrics("numFiles").value === latestFiles,
      s"scan opened ${scan.metrics("numFiles").value} files, latest partition has $latestFiles")
    // null partition values are ignored by resolution
    val withNull = Seq((99L, null.asInstanceOf[String], 9.9), (100L, "d2", 1.0))
      .toDF("id", "day", "m")
    cat.overwrite("n", withNull, Seq("day"))
    assert(cat.latestPartitionValue("n", "day") === Some("d2"))
    // versioned tier: same numeric ordering through manifest entries
    cat.overwriteVersioned("v", df, Seq("bucket"))
    assert(cat.latestPartitionValue("v", "bucket") === Some("10"))
    assert(cat.latestPartition("v", "bucket").count() === 10)
  }

  test("latestPartitionValue honors a recorded STRING partition type (lexicographic, like max(col))") {
    val cat = freshCatalog
    // with partition-type inference off, numeric-looking dir strings
    // stay STRING on read-back — the column's logical max is
    // lexicographic ("7" > "10"), and resolution must match it
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    try {
      cat.overwriteVersioned("s",
        Seq((1L, "7", 1.0), (2L, "10", 2.0)).toDF("id", "bucket", "m"),
        Seq("bucket"))
      // a metadata-only ALTER records the union schema — bucket: string
      cat.addColumn("s", "tag", org.apache.spark.sql.types.StringType)
      val t = cat.read("s")
      assert(t.schema("bucket").dataType === org.apache.spark.sql.types.StringType)
      val colMax = t.select(max(col("bucket"))).head().getString(0)
      assert(colMax === "7", "string column's logical max is lexicographic")
      assert(cat.latestPartitionValue("s", "bucket") === Some("7"),
        "metadata resolution must mirror the recorded string type's order")
      assert(cat.latestPartition("s", "bucket").select("id")
        .as[Long].collect().toSeq === Seq(1L))
    } finally
      spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "true")
  }

  test("evolveSchema append missing a partition column falls back to the full restage") {
    val cat = freshCatalog
    cat.overwriteVersioned("fb", Seq((1L, "a", 1.0)).toDF("id", "p", "m"), Seq("p"))
    // add/drop-only drift, but the frame DROPS the partition column —
    // the metadata-only branch would partitionBy a missing column; it
    // must fall through to the union-by-name restage (null partition)
    cat.appendVersioned("fb", Seq((2L, "x")).toDF("id", "tag"), Seq("p"),
      evolveSchema = true)
    val out = cat.read("fb")
    assert(out.count() === 2)
    assert(out.filter(col("id") === 2L).select("p").head().isNullAt(0))
    assert(out.filter(col("id") === 2L).select("tag").as[String].head() === "x")
    assert(out.filter(col("id") === 1L).select("m").as[Double].head() === 1.0)
  }

  test("merge match probe is index-pruned to the delta's key range") {
    import graft.storage.SkippingIndex
    val root = Files.createTempDirectory("graft-ipm").toString
    val cat = new ParquetCatalog(spark, root)
    val full = (0 until 1000).map(i => (i.toLong, s"d${i / 250}", i * 1.0))
      .toDF("id", "day", "m")
    cat.overwrite("t", full, Seq("day"))
    // key-clustered files + a skipping index over the merge key
    cat.compact("t", rowsPerFile = 100, partitionBy = Seq("day"),
      clusterBy = Seq("id"))
    cat.index("t", Seq("id"))
    val allFiles = cat.fileCount("t")
    // delta confined to ids [10, 20] — files outside that key range must
    // never be OPENED by the matched-key probe
    val delta = Seq((10L, "d0", 99.0), (20L, "d0", 98.0), (2000L, "d1", 1.0))
      .toDF("id", "day", "m")
    val probe = cat.matchScanFrame("t", delta, Seq("id"), cat.read("t"))
    val opened = probe.inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    assert(opened.size < allFiles,
      s"probe opened ${opened.size} of $allFiles files — no pruning happened")
    // cross-check against the stats: every skipped file's [min,max]
    // really is outside the delta's range
    val stats = SkippingIndex.read(s"$root/t")
    stats.foreach { fs =>
      val name = fs.file.substring(fs.file.lastIndexOf('/') + 1)
      val cs = fs.cols.find(_.column == "id").get
      val outside = cs.max.toDouble < 10.0 || cs.min.toDouble > 2000.0
      if (outside && !cs.hasNulls)
        assert(!opened.contains(name), s"out-of-range file $name was opened")
    }
    // and the merge result is unchanged by pruning
    cat.upsert("t", delta, Seq("id"), partitionBy = Seq("day"))
    val expected = graft.operators.Upsert.merge(full, delta, Seq("id"))
      .orderBy("id").select($"id", $"day", $"m")
      .as[(Long, String, Double)].collect()
    assert(cat.read("t").select($"id", $"day".cast("string"), $"m")
      .orderBy("id").as[(Long, String, Double)].collect() === expected)
  }

  test("row-level UPDATE/DELETE probe is index-pruned to the WHERE's range") {
    import graft.storage.SkippingIndex
    val root = Files.createTempDirectory("graft-upp").toString
    val cat = new ParquetCatalog(spark, root)
    val full = (0 until 1000).map(i => (i.toLong, s"d${i / 250}", i * 1.0))
      .toDF("id", "day", "m")
    cat.overwriteVersioned("t", full, Seq("day"))
    cat.compact("t", rowsPerFile = 100, partitionBy = Seq("day"),
      clusterBy = Seq("id"))
    cat.index("t", Seq("id"))
    val allFiles = cat.fileCount("t")
    // a point UPDATE's probe must not open the whole table
    val opened = cat.probeCandidates("t",
        col("id") === 137L && col("m") > 0.0)
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    assert(opened.size < allFiles,
      s"probe opened ${opened.size} of $allFiles files — no pruning happened")
    // cross-check vs the stats: every file whose id-range excludes 137
    // stays closed
    val stats = SkippingIndex.readAt(cat.statsPath("t"))
    stats.foreach { fs =>
      val name = fs.file.substring(fs.file.lastIndexOf('/') + 1)
      val cs = fs.cols.find(_.column == "id").get
      if ((cs.max.toDouble < 137.0 || cs.min.toDouble > 137.0) && !cs.hasNulls)
        assert(!opened.contains(name), s"out-of-range file $name was opened")
    }
    // an OR at the top level implies no single range — the probe must
    // fall back to the full scan rather than prune unsoundly
    assert(cat.probeCandidates("t",
      col("id") === 1L || col("m") > 990.0).size === allFiles)
    // end-to-end: results are identical to the unpruned semantics
    val (_, n) = cat.updateWhere("t", col("id") === 137L,
      Map("m" -> lit(-1.0)))
    assert(n === 1L)
    assert(cat.read("t").filter(col("m") < 0).select("id")
      .as[Long].collect() === Array(137L))
    assert(cat.read("t").count() === 1000)
    val (_, removed) = cat.deleteVersioned("t", col("id") >= 990L)
    assert(removed === 10L)
    assert(cat.read("t").count() === 990)
    // the SQL text door takes the same pruned probe (expr-parsed WHERE)
    val (_, n2) = cat.updateWhere("t",
      org.apache.spark.sql.functions.expr("id = 5 AND m >= 0"),
      Map("m" -> lit(-2.0)))
    assert(n2 === 1L)
    assert(cat.read("t").filter(col("m") === -2.0).select("id")
      .as[Long].collect() === Array(5L))
  }

  test("in-place scoped ops handle multi-level and path-hostile partition values") {
    val root = Files.createTempDirectory("graft-ml").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t", Seq(
      (1L, "d1", Some("a/b:c d%"), 1.0), (2L, "d1", Some("plain"), 2.0),
      (3L, "d2", None, 3.0))
      .toDF("id", "day", "category", "m"), Seq("day", "category"))
    // update moves id=1 OUT of its hostile-value slot: the emptied
    // two-level dir (and its then-empty parent, if any) must be removed
    cat.upsert("t", Seq((1L, "d9", Some("moved"), 10.0))
      .toDF("id", "day", "category", "m"),
      Seq("id"), partitionBy = Seq("day", "category"))
    val back = cat.read("t")
      .select($"id", $"day".cast("string"), $"category".cast("string"), $"m")
      .orderBy("id").as[(Long, String, Option[String], Double)].collect()
    assert(back === Seq((1L, "d9", Some("moved"), 10.0),
      (2L, "d1", Some("plain"), 2.0), (3L, "d2", None, 3.0)))
    // the escaped dir is gone; d1 itself survives (still holds 'plain')
    import scala.jdk.CollectionConverters._
    def dirsUnder(rel: String): Set[String] = {
      val p = java.nio.file.Paths.get(root, "t", rel)
      if (!Files.isDirectory(p)) Set.empty
      else {
        val s = Files.list(p)
        try s.iterator().asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString).toSet
        finally s.close()
      }
    }
    assert(dirsUnder("day=d1") == Set("category=plain"),
      s"hostile-value dir must be dropped: ${dirsUnder("day=d1")}")
    // a delete that empties d2 entirely removes BOTH levels
    assert(cat.delete("t", col("day") === "d2", Seq("day", "category")) === 1L)
    assert(!Files.exists(java.nio.file.Paths.get(root, "t", "day=d2")),
      "emptied two-level partition tree must be removed to the day level")
  }

  test("layout guard: ops shaped differently from the on-disk layout fail loudly") {
    val root = Files.createTempDirectory("graft-lg").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwrite("t", Seq((1L, "d1", "EU", 1.0), (2L, "d2", "US", 2.0))
      .toDF("id", "day", "region", "m"), Seq("day"))
    // scoped upsert with the WRONG partition column
    val e1 = intercept[IllegalArgumentException] {
      cat.upsert("t", Seq((1L, "d1", "EU", 10.0)).toDF("id", "day", "region", "m"),
        Seq("id"), partitionBy = Seq("region"))
    }
    assert(e1.getMessage.contains("partitioned by (day)"))
    // append defaulting: no partitionBy given -> follows the disk layout
    cat.append("t", Seq((3L, "d3", "EU", 3.0)).toDF("id", "day", "region", "m"))
    assert(Files.isDirectory(java.nio.file.Paths.get(root, "t", "day=d3")),
      "pb-less append must follow the table's hive layout")
    // mismatch on delete and dynamic overwrite too
    intercept[IllegalArgumentException] {
      cat.delete("t", col("id") === 1L, Seq("region"))
    }
    intercept[IllegalArgumentException] {
      cat.overwritePartitions("t",
        Seq((9L, "d9", "EU", 9.0)).toDF("id", "day", "region", "m"), Seq("region"))
    }
    // versioned: explicit conflicting layout on a scoped op fails; a
    // full overwriteVersioned (the explicit layout-change verb) succeeds
    cat.overwriteVersioned("u", Seq((1L, "d1", "EU", 1.0))
      .toDF("id", "day", "region", "m"), Seq("day"))
    val e2 = intercept[IllegalArgumentException] {
      cat.upsertVersioned("u", Seq((1L, "d1", "EU", 10.0))
        .toDF("id", "day", "region", "m"), Seq("id"), partitionBy = Seq("region"))
    }
    assert(e2.getMessage.contains("layout change requires"))
    cat.overwriteVersioned("u", Seq((1L, "d1", "EU", 1.0))
      .toDF("id", "day", "region", "m"), Seq("region"))
    assert(cat.manifest("u", 2).partitionBy == Seq("region"))
  }

  test("compaction collapses small files and preserves content") {
    val cat = freshCatalog
    // 10 appends of 10 rows -> many small files
    (0 until 10).foreach { i =>
      cat.append("t", (0 until 10).map(j => (i * 10L + j, s"v$i"))
        .toDF("id", "v"))
    }
    val before = cat.fileCount("t")
    assert(before >= 10, s"expected many small files, got $before")
    val expected = cat.read("t").orderBy("id")
      .as[(Long, String)].collect().toSeq
    cat.compact("t", rowsPerFile = 50, clusterBy = Seq("id"))
    assert(cat.fileCount("t") === 2, "100 rows / 50 per file = 2 files")
    assert(cat.read("t").orderBy("id").as[(Long, String)].collect().toSeq
      === expected, "compaction must not change content")
  }

  test("describeDetail reports both tiers from metadata alone") {
    val cat = freshCatalog
    cat.overwriteVersioned("v",
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "p", "m"), Seq("p"))
    cat.addConstraint("v", "m_pos", "m > 0")
    val d = cat.describeDetail("v").head()
    assert(d.getAs[String]("tier") === "versioned")
    assert(d.getAs[Long]("version") === 2L)
    assert(d.getAs[Long]("retained_versions") === 2L)
    assert(d.getAs[Long]("num_files") === 2L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("partition_by") === "p")
    assert(d.getAs[Long]("n_constraints") === 1L)
    assert(!d.isNullAt(d.fieldIndex("last_commit_ts")))
    cat.overwrite("u", Seq((1L, 1.0)).toDF("id", "m"))
    val u = cat.describeDetail("u").head()
    assert(u.getAs[String]("tier") === "in-place")
    assert(u.isNullAt(u.fieldIndex("version")))
    assert(u.getAs[Long]("num_files") >= 1L && u.getAs[Long]("size_bytes") > 0L)
  }
}
