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
}
