package graft

import graft.storage.ParquetCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import java.nio.file.Files

/** Metadata-only ALTER TABLE: add/drop column commits re-reference
  * every file and only move the recorded schema; dropped bytes stay in
  * the files but are never decoded (explicit-schema reads project
  * through the recorded shape — what Delta needs column mapping for).
  * Plus the manifest-driven compaction planner. */
class AlterSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): ParquetCatalog =
    new ParquetCatalog(spark, Files.createTempDirectory("graft-alt").toString)

  test("addColumn is metadata-only: files re-referenced, old rows read null") {
    val cat = fresh()
    cat.overwriteVersioned("t", Seq((1L, "a", 1.0)).toDF("id", "p", "m"), Seq("p"))
    val before = cat.manifestFiles("t", 1)
    cat.addColumn("t", "tag", StringType)
    assert(cat.manifestFiles("t", 2) === before, "zero files rewritten")
    assert(cat.read("t").select("id", "tag")
      .as[(Long, Option[String])].collect().toSeq === Seq((1L, None)))
    // the widened shape is the table's write contract now
    cat.appendVersioned("t", Seq((2L, "a", 2.0, "x")).toDF("id", "p", "m", "tag"),
      Seq("p"))
    assert(cat.read("t").filter(col("id") === 2L)
      .select("tag").as[String].head() === "x")
    // time travel keeps each version's own shape
    assert(!cat.readVersion("t", 1).columns.contains("tag"))
    assert(cat.history("t").filter(col("version") === 2)
      .select("operation").as[String].head() === "alterSchema")
  }

  test("dropColumn is metadata-only: bytes stay, readers never decode them") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", 1.0, "x")).toDF("id", "p", "m", "tag"), Seq("p"))
    val before = cat.manifestFiles("t", 1)
    cat.dropColumn("t", "tag")
    assert(cat.manifestFiles("t", 2) === before)
    assert(!cat.read("t").columns.contains("tag"))
    assert(cat.readVersion("t", 1).columns.contains("tag"),
      "the dropped column is still readable via time travel")
    // subsequent writes use the narrowed shape
    cat.appendVersioned("t", Seq((2L, "a", 2.0)).toDF("id", "p", "m"), Seq("p"))
    assert(cat.read("t").count() === 2)
  }

  test("drop refuses partition, constraint-referenced, missing, and last columns") {
    val cat = fresh()
    cat.overwriteVersioned("t", Seq((1L, "a", 1.0)).toDF("id", "p", "m"), Seq("p"))
    cat.addConstraint("t", "m_pos", "m > 0")
    intercept[IllegalArgumentException](cat.dropColumn("t", "p"))
    intercept[IllegalArgumentException](cat.dropColumn("t", "m"))
    intercept[IllegalArgumentException](cat.dropColumn("t", "nope"))
    intercept[IllegalArgumentException](cat.addColumn("t", "id", DoubleType))
  }

  test("drop's constraint guard resolves references case-insensitively, not by substring") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", 1.0, 2.0)).toDF("id", "p", "m", "marker"), Seq("p"))
    // Spark resolves columns case-insensitively: a constraint written
    // 'M > 0' references column m and must block dropping it
    cat.addConstraint("t", "m_pos_uc", "M > 0")
    intercept[IllegalArgumentException](cat.dropColumn("t", "m"))
    cat.dropConstraint("t", "m_pos_uc")
    // ...and a substring is NOT a reference: 'marker > 0' must not
    // block dropping column m
    cat.addConstraint("t", "marker_pos", "marker > 0")
    cat.dropColumn("t", "m")
    assert(!cat.read("t").columns.contains("m"))
    assert(cat.read("t").columns.contains("marker"))
    // the surviving constraint still enforces
    intercept[Exception](cat.appendVersioned("t",
      Seq((2L, "a", -1.0)).toDF("id", "p", "marker")))
  }

  test("alterSchema commits carry constraints and the txn registry forward") {
    val cat = fresh()
    cat.overwriteVersioned("t", Seq((1L, 1.0)).toDF("id", "m"))
    cat.addConstraint("t", "m_pos", "m > 0")
    cat.appendBatch("t", Seq((2L, 2.0)).toDF("id", "m"), "sink#3")
    cat.addColumn("t", "tag", StringType)
    assert(cat.constraints("t") === Map("m_pos" -> "m > 0"))
    assert(cat.sinkHighWater("t", "sink") === Some(3L))
    intercept[Exception](cat.appendVersioned("t",
      Seq((3L, -1.0, "y")).toDF("id", "m", "tag")))
  }

  test("compactionPlan reads the worklist from the manifest alone, worst-first") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "p", "m"), Seq("p"))
    // fragment partition b with 4 more single-row appends, a with 1
    (0 until 4).foreach(i => cat.appendVersioned("t",
      Seq((10L + i, "b", i.toDouble)).toDF("id", "p", "m"), Seq("p")))
    cat.appendVersioned("t", Seq((20L, "a", 9.0)).toDF("id", "p", "m"), Seq("p"))
    val plan = cat.compactionPlan("t", maxFiles = 2)
    assert(plan.map(_._1) === Seq(Seq("p" -> "b")), s"got $plan")
    assert(plan.head._2 === 5)
    // acting on the plan clears it
    plan.foreach { case (spec, _) =>
      cat.compactPartition("t", 1000L, spec.map { case (k, v) => k -> (v: Any) })
    }
    assert(cat.compactionPlan("t", maxFiles = 2).isEmpty)
    assert(cat.read("t").count() === 7)
  }
}
