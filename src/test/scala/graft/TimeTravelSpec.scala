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
