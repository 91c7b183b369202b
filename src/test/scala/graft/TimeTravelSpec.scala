package graft

import graft.storage.ParquetCatalog
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Versioned tables: time travel, migration of unversioned tables,
  * retention vacuum, and the invariant that a new overwrite never
  * invalidates a retained reader. */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (ParquetCatalog, String) = {
    val root = Files.createTempDirectory("graft-tt").toString
    (new ParquetCatalog(spark, root), root)
  }

  test("three versioned overwrites: current follows, history readable") {
    val (cat, _) = fresh()
    (1 to 3).foreach { v =>
      val ver = cat.overwriteVersioned("t",
        Seq.tabulate(10)(i => (i.toLong, s"gen$v")).toDF("id", "gen"))
      assert(ver == v)
    }
    assert(cat.versions("t") == Seq(1L, 2L, 3L))
    assert(cat.read("t").select("gen").distinct().head().getString(0) == "gen3")
    assert(cat.readVersion("t", 1).filter(col("gen") === "gen1").count() == 10)
    assert(cat.readVersion("t", 2).filter(col("gen") === "gen2").count() == 10)
  }

  test("an unversioned table migrates as the first retained version") {
    val (cat, _) = fresh()
    cat.overwrite("t", Seq((1L, "old")).toDF("id", "gen"))
    val ver = cat.overwriteVersioned("t", Seq((1L, "new")).toDF("id", "gen"))
    assert(ver == 2 && cat.versions("t") == Seq(1L, 2L))
    assert(cat.readVersion("t", 1).head().getString(1) == "old")
    assert(cat.read("t").head().getString(1) == "new")
  }

  test("a retained reader survives a subsequent overwrite (write-once dirs)") {
    val (cat, _) = fresh()
    cat.overwriteVersioned("t", Seq.tabulate(100)(i => (i.toLong, "a")).toDF("id", "gen"))
    val v1 = cat.readVersion("t", 1)
    cat.overwriteVersioned("t", Seq.tabulate(100)(i => (i.toLong, "b")).toDF("id", "gen"))
    // the lazy v1 frame still reads version-1 files — nothing was deleted
    assert(v1.filter(col("gen") === "a").count() == 100)
  }

  test("vacuum keeps the newest versions and sweeps writer debris") {
    val (cat, root) = fresh()
    (1 to 4).foreach { v =>
      cat.overwriteVersioned("t", Seq((v.toLong, s"gen$v")).toDF("id", "gen"))
    }
    Files.createDirectory(Paths.get(root, ".tmp-crashed-123")) // fake debris
    val removed = cat.vacuum("t", keep = 2)
    assert(removed == 3) // v1, v2, and the debris dir
    assert(cat.versions("t") == Seq(3L, 4L))
    assert(cat.read("t").head().getString(1) == "gen4")
    assert(intercept[IllegalArgumentException] {
      cat.readVersion("t", 1)
    }.getMessage.contains("not retained"))
  }

  test("skipping stats ride each version: written through the pointer, kept per version") {
    val (cat, root) = fresh()
    cat.overwriteVersioned("t",
      Seq.tabulate(100)(i => (i.toLong, i * 10L)).toDF("id", "v"))
    // stats written THROUGH the symlink land in the current version dir
    graft.storage.SkippingIndex.write(spark, s"$root/t", Seq("id"))
    val v1Stats = graft.storage.SkippingIndex.read(s"$root/t")
    assert(v1Stats.nonEmpty)
    cat.overwriteVersioned("t",
      Seq.tabulate(50)(i => (i.toLong + 1000, i * 10L)).toDF("id", "v"))
    // the NEW version has no stats yet (write-once dirs: nothing leaked)
    assert(intercept[IllegalArgumentException] {
      graft.storage.SkippingIndex.read(s"$root/t")
    }.getMessage.contains("no skipping index"))
    // ...while version 1 keeps its own stats alongside its data
    val v1Dir = s"$root/.versions/t/v1"
    assert(graft.storage.SkippingIndex.read(v1Dir) == v1Stats)
    assert(graft.storage.SkippingIndex
      .scan(spark, v1Dir, "id", 10, 20).count() == 11)
  }

  test("versioned upsert: new version, old readable, untouched partitions hard-link-shared") {
    val (cat, root) = fresh()
    cat.overwriteVersioned("t", Seq(
      (1L, "d1", 1.0), (2L, "d1", 2.0), (3L, "d2", 3.0), (4L, "d3", 4.0))
      .toDF("id", "day", "m"), Seq("day"))
    // delta touches only d2 (update) and d4 (insert)
    val delta = Seq((3L, "d2", 30.0), (9L, "d4", 90.0)).toDF("id", "day", "m")
    val v2 = cat.upsertVersioned("t", delta, Seq("id"), partitionBy = Seq("day"))
    assert(v2 == 2 && cat.versions("t") == Seq(1L, 2L))
    // old version intact
    assert(cat.readVersion("t", 1).count() == 4)
    assert(cat.readVersion("t", 1).filter(col("id") === 3)
      .select("m").head().getDouble(0) == 3.0)
    // new version = semantic merge
    val back = cat.read("t").select($"id", $"day".cast("string"), $"m")
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(back === Seq((1L, "d1", 1.0), (2L, "d1", 2.0), (3L, "d2", 30.0),
      (4L, "d3", 4.0), (9L, "d4", 90.0)))
    // untouched partitions share inodes between v1 and v2 (zero copy)
    import scala.jdk.CollectionConverters._
    for (p <- Seq("day=d1", "day=d3")) {
      val v1p = Paths.get(root, ".versions", "t", "v1", p)
      val v2p = Paths.get(root, ".versions", "t", "v2", p)
      val v1Files = Files.list(v1p).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toList
      assert(v1Files.nonEmpty)
      v1Files.foreach { f =>
        val twin = v2p.resolve(f.getFileName)
        assert(Files.exists(twin) && Files.isSameFile(f, twin),
          s"$p files must be hard-link-shared across versions")
      }
    }
    // touched partition is NOT shared (fresh bytes)
    val d2v1 = Files.list(Paths.get(root, ".versions", "t", "v1", "day=d2"))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
    d2v1.foreach { f =>
      val twin = Paths.get(root, ".versions", "t", "v2", "day=d2")
        .resolve(f.getFileName)
      assert(!Files.exists(twin) || !Files.isSameFile(f, twin))
    }
  }

  test("versioned upsert migrates an unversioned table; vacuum only unlinks shares") {
    val (cat, _) = fresh()
    cat.overwrite("t", Seq((1L, "d1", 1.0), (2L, "d2", 2.0))
      .toDF("id", "day", "m"), Seq("day"))
    val v = cat.upsertVersioned("t", Seq((2L, "d2", 20.0)).toDF("id", "day", "m"),
      Seq("id"), partitionBy = Seq("day"))
    assert(v == 2 && cat.versions("t") == Seq(1L, 2L))
    assert(cat.readVersion("t", 1).filter(col("id") === 2)
      .select("m").head().getDouble(0) == 2.0)
    // dropping v1 must not damage v2's shared (hard-linked) d1 files
    cat.vacuum("t", keep = 1)
    assert(cat.versions("t") == Seq(2L))
    assert(cat.read("t").select($"id", $"day".cast("string"), $"m")
      .orderBy("id").as[(Long, String, Double)].collect()
      === Seq((1L, "d1", 1.0), (2L, "d2", 20.0)))
  }

  test("versioned delete: removed rows gone from current, present in history") {
    val (cat, _) = fresh()
    cat.overwriteVersioned("t", Seq(
      (1L, "d1", 1.0), (2L, "d1", 2.0), (3L, "d2", 3.0))
      .toDF("id", "day", "m"), Seq("day"))
    val (v2, removed) = cat.deleteVersioned("t", col("id") === 3L, Seq("day"))
    assert(v2 == 2 && removed == 1)
    assert(cat.read("t").count() == 2)
    assert(cat.readVersion("t", 1).count() == 3)
    // fully-emptied partition absent from the new version
    assert(cat.read("t").select($"day".cast("string")).distinct()
      .as[String].collect().sorted === Seq("d1"))
  }

  test("unversioned entry points keep working through the version pointer") {
    val (cat, _) = fresh()
    cat.overwriteVersioned("t", Seq.tabulate(50)(i => (i.toLong, i * 2L)).toDF("id", "v"))
    // upsert reads through the symlink and swaps the pointer target
    cat.upsert("t", Seq((0L, 999L), (100L, 1L)).toDF("id", "v"), Seq("id"))
    val out = cat.read("t")
    assert(out.count() == 51)
    assert(out.filter(col("id") === 0).head().getLong(1) == 999L)
  }
}
