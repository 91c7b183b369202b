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

  test("renameColumn is metadata-only: files re-referenced, values read by id") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "p", "m"), Seq("p"))
    cat.index("t", Seq("m"))
    val before = cat.manifestFiles("t", 1)
    val v = cat.renameColumn("t", "m", "metric")
    // zero bytes rewritten; the OLD files' values surface under the
    // NEW name (Spark's parquet field-id resolution, not a null-fill)
    assert(cat.manifestFiles("t", v) === before, "zero files rewritten")
    assert(cat.read("t").select($"id", $"metric")
      .as[(Long, Double)].collect().sorted === Array((1L, 1.0), (2L, 2.0)))
    assert(!cat.read("t").columns.contains("m"))
    // time travel reads each version under ITS OWN names
    assert(cat.readVersion("t", 1).select("m").as[Double].collect().sorted ===
      Array(1.0, 2.0))
    assert(!cat.readVersion("t", 1).columns.contains("metric"))
    // post-rename writes mix with pre-rename files transparently
    cat.appendVersioned("t", Seq((3L, "a", 3.0)).toDF("id", "p", "metric"),
      Seq("p"))
    assert(cat.read("t").select($"id", $"metric")
      .as[(Long, Double)].collect().sorted ===
      Array((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    // the skipping index re-keyed to the new name (pruning survives)
    assert(graft.storage.SkippingIndex.readAt(cat.statsPath("t"))
      .forall(_.cols.exists(_.column == "metric")))
    // a row-level verb across both file generations sees one column
    val (_, n) = cat.updateWhere("t", col("metric") === 1.0,
      Map("metric" -> lit(-1.0)))
    assert(n === 1L)
    assert(cat.read("t").filter($"metric" < 0).select("id").as[Long]
      .collect() === Array(1L))
  }

  test("renameColumn refuses partition/constraint/conflict; pre-id files need compaction") {
    val cat = fresh()
    cat.overwriteVersioned("t", Seq((1L, "a", 1.0)).toDF("id", "p", "m"), Seq("p"))
    cat.addConstraint("t", "m_pos", "m > 0")
    intercept[IllegalArgumentException](cat.renameColumn("t", "p", "q"))
    intercept[IllegalArgumentException](cat.renameColumn("t", "m", "metric"))
    intercept[IllegalArgumentException](cat.renameColumn("t", "id", "M")) // ci clash
    intercept[IllegalArgumentException](cat.renameColumn("t", "nope", "x"))
    // files written OUTSIDE the engine (a migrated plain dir) carry no
    // field ids — the rename must refuse with the compaction remedy,
    // never silently null the column
    val root = Files.createTempDirectory("graft-noid").toString
    val cat2 = new ParquetCatalog(spark, root)
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "m").write
      .parquet(s"$root/plain")
    val e = intercept[IllegalArgumentException](
      cat2.renameColumn("plain", "m", "metric"))
    assert(e.getMessage.contains("compact") || e.getMessage.contains("OPTIMIZE"),
      e.getMessage)
    // compaction restages with ids; the rename then succeeds
    cat2.compact("plain", rowsPerFile = 10)
    cat2.renameColumn("plain", "m", "metric")
    assert(cat2.read("plain").select($"id", $"metric")
      .as[(Long, Double)].collect().sorted === Array((1L, 10.0), (2L, 20.0)))
  }

  test("alterColumnType widens metadata-only; lossy retypes refuse") {
    val cat = fresh()
    val df = Seq((1, "a", 1.5f), (2, "b", 2.5f)).toDF("id", "p", "m")
    cat.overwriteVersioned("t", df, Seq("p"))
    val before = cat.manifestFiles("t", 1)
    // int -> long and float -> double: one metadata commit each, old
    // narrow files widened at decode
    cat.alterColumnType("t", "id", org.apache.spark.sql.types.LongType)
    val v = cat.alterColumnType("t", "m", DoubleType)
    assert(cat.manifestFiles("t", v) === before, "zero files rewritten")
    val out = cat.read("t")
    assert(out.schema("id").dataType === org.apache.spark.sql.types.LongType)
    assert(out.schema("m").dataType === DoubleType)
    assert(out.select($"id", $"m").as[(Long, Double)].collect().sorted ===
      Array((1L, 1.5f.toDouble), (2L, 2.5f.toDouble)))
    // the wide shape is the write contract; mixed generations read fine
    cat.appendVersioned("t", Seq((3L, "a", 3.5)).toDF("id", "p", "m"), Seq("p"))
    assert(cat.read("t").select(sum($"id")).as[Long].head() === 6L)
    // time travel keeps the old version's narrow shape
    assert(cat.readVersion("t", 1).schema("id").dataType ===
      org.apache.spark.sql.types.IntegerType)
    // narrowing and non-numeric retypes refuse with the restage remedy
    val e = intercept[IllegalArgumentException](
      cat.alterColumnType("t", "id", org.apache.spark.sql.types.IntegerType))
    assert(e.getMessage.contains("restage"), e.getMessage)
    intercept[IllegalArgumentException](
      cat.alterColumnType("t", "m", StringType))
    intercept[IllegalArgumentException](
      cat.alterColumnType("t", "p", org.apache.spark.sql.types.IntegerType))
    // same-type is a no-op, not an error
    assert(cat.alterColumnType("t", "m", DoubleType) === cat.currentVersion("t"))
  }

  test("evolveSchema append with a widened column is metadata-only, not a restage") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1, "d1", 1.0), (2, "d2", 2.0)).toDF("id", "day", "m"), Seq("day"))
    val v1Files = cat.manifestFiles("t", 1)
    // incoming id is LONG (wider) + a new column: the old full-restage
    // path rewrote the table; now untouched files are re-referenced and
    // the union schema records the wide type
    val v2 = cat.appendVersioned("t",
      Seq((3L, "d1", 3.0, "x")).toDF("id", "day", "m", "tag"),
      Seq("day"), evolveSchema = true)
    val v2Files = cat.manifestFiles("t", v2)
    v1Files.foreach(f => assert(v2Files.contains(f),
      s"widening evolution must re-reference $f, not restage"))
    val out = cat.read("t")
    assert(out.schema("id").dataType === org.apache.spark.sql.types.LongType)
    assert(out.orderBy("id").select($"id", $"tag")
      .as[(Long, Option[String])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, Some("x"))))
    // a NARROWING still takes the full restage (existing pin holds)
    val v3 = cat.appendVersioned("t",
      Seq((4, "d2", 4.0, "y")).toDF("id", "day", "m", "tag")
        .withColumn("id", col("id").cast("int")),
      Seq("day"), evolveSchema = true)
    assert(cat.manifestFiles("t", v3).intersect(v2Files).isEmpty,
      "narrowing must restage")
    assert(cat.read("t").count() === 4)
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

  test("drop then re-add never resurrects old bytes: mapping off refuses until compaction") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", "secret"), (2L, "b", "hidden")).toDF("id", "p", "x"), Seq("p"))
    cat.dropColumn("t", "x")
    // live files still hold x's physical bytes: a by-name re-add would
    // resurrect them — the verb must refuse with the compaction remedy
    val e = intercept[IllegalArgumentException](cat.addColumn("t", "x", StringType))
    assert(e.getMessage.contains("compact") || e.getMessage.contains("OPTIMIZE"),
      e.getMessage)
    // compaction sheds the dropped bytes; the re-add then succeeds and
    // EVERY pre-existing row reads the re-added column as null
    cat.compact("t", rowsPerFile = 1000, partitionBy = Seq("p"))
    cat.addColumn("t", "x", StringType)
    assert(cat.read("t").select("x").as[Option[String]].collect().toSeq ===
      Seq(None, None))
    // a DIFFERENT never-dropped name adds without any footer check
    cat.addColumn("t", "y", DoubleType)
    assert(cat.read("t").select("y").as[Option[Double]].collect().forall(_.isEmpty))
  }

  test("drop then re-add under an active mapping is metadata-only and reads null") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", "secret", 1.0), (2L, "b", "hidden", 2.0))
        .toDF("id", "p", "x", "m"), Seq("p"))
    cat.renameColumn("t", "m", "metric") // activates the mapping
    cat.dropColumn("t", "x")
    val before = cat.manifestFiles("t", cat.currentVersion("t"))
    val v = cat.addColumn("t", "x", StringType)
    // zero files rewritten AND zero resurrection: the fresh field id
    // resolves to nothing in the carried files
    assert(cat.manifestFiles("t", v) === before, "re-add must stay metadata-only")
    assert(cat.read("t").select("x").as[Option[String]].collect().toSeq ===
      Seq(None, None))
    // new writes land under the fresh id and read back; old rows stay null
    cat.appendVersioned("t", Seq((3L, "a", "new", 3.0))
      .toDF("id", "p", "x", "metric"), Seq("p"))
    assert(cat.read("t").orderBy("id").select("x")
      .as[Option[String]].collect().toSeq === Seq(None, None, Some("new")))
    // time travel still shows the pre-drop values under their version
    assert(cat.readVersion("t", 1).orderBy("id").select("x")
      .as[String].collect().toSeq === Seq("secret", "hidden"))
  }

  test("fresh ids mint above the ALL-TIME high-water, never reusing a dropped id") {
    val cat = fresh()
    // ids at v1: id=1, p=2, m=3, z=4 (z holds the MAX id and real bytes)
    cat.overwriteVersioned("t",
      Seq((1L, "a", 1.0, 777.0)).toDF("id", "p", "m", "z"), Seq("p"))
    cat.renameColumn("t", "m", "metric") // activates the mapping
    cat.dropColumn("t", "z")             // drops the max-id column
    // a NEW column must not inherit z's physical field id — with a
    // live-max mint it would id-resolve to z's old bytes (777.0)
    cat.addColumn("t", "znew", DoubleType)
    assert(cat.read("t").select("znew").as[Option[Double]].collect().toSeq ===
      Seq(None), "the new column must read NULL, not the dropped column's bytes")
    // ...and the same through the evolving-append minting path
    cat.appendVersioned("t", Seq((2L, "a", 2.0, 5.0, 6.0))
      .toDF("id", "p", "metric", "znew", "z2"), Seq("p"), evolveSchema = true)
    assert(cat.read("t").orderBy("id").select("z2")
      .as[Option[Double]].collect().toSeq === Seq(None, Some(6.0)))
  }

  test("evolving append/merge re-introducing a dropped name hits the same guard") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", "secret")).toDF("id", "p", "x"), Seq("p"))
    cat.dropColumn("t", "x")
    // mapping OFF: an evolving append whose frame carries x must refuse
    // (its metadata-only commit would re-reference the old bytes)
    val e = intercept[IllegalArgumentException](cat.appendVersioned("t",
      Seq((2L, "b", "new")).toDF("id", "p", "x"), Seq("p"), evolveSchema = true))
    assert(e.getMessage.contains("compact") || e.getMessage.contains("OPTIMIZE"),
      e.getMessage)
    // ...and an evolving MERGE likewise
    val e2 = intercept[IllegalArgumentException](cat.upsertVersioned("t",
      Seq((2L, "b", "new")).toDF("id", "p", "x"), Seq("id"),
      evolveSchema = true))
    assert(e2.getMessage.contains("compact") || e2.getMessage.contains("OPTIMIZE"),
      e2.getMessage)
    // mapping ON: the staged files' fresh ids make it sound — old rows
    // read null, the new row reads its value
    val cat2 = fresh()
    cat2.overwriteVersioned("t",
      Seq((1L, "a", "secret", 1.0)).toDF("id", "p", "x", "m"), Seq("p"))
    cat2.renameColumn("t", "m", "metric")
    cat2.dropColumn("t", "x")
    cat2.appendVersioned("t", Seq((2L, "b", "new", 2.0))
      .toDF("id", "p", "x", "metric"), Seq("p"), evolveSchema = true)
    assert(cat2.read("t").orderBy("id").select("x")
      .as[Option[String]].collect().toSeq === Seq(None, Some("new")))
  }

  test("a second rename under the active mapping runs zero Spark jobs") {
    val cat = fresh()
    cat.overwriteVersioned("t",
      Seq((1L, "a", 1.0, 2.0)).toDF("id", "p", "m", "n"), Seq("p"))
    cat.renameColumn("t", "m", "metric") // activation: pays the footer proof
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      cat.renameColumn("t", "n", "norm") // mapping already on: O(metadata)
      Thread.sleep(1000) // listener bus dispatch is async; let it drain
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() === 0,
      s"an already-mapped rename must be metadata-only, ran ${jobs.get()} job(s)")
    assert(cat.read("t").columns.toSet === Set("id", "p", "metric", "norm"))
    assert(cat.read("t").select("norm").as[Double].head() === 2.0)
  }

  test("a full restage clears dropped-name markers: re-add needs no footer check") {
    val cat = fresh()
    cat.overwriteVersioned("t", Seq((1L, "a", "secret")).toDF("id", "p", "x"), Seq("p"))
    cat.dropColumn("t", "x")
    // full overwrite replaces every file — no old bytes survive, so the
    // marker clears and the re-add is a plain metadata commit
    cat.overwriteVersioned("t", Seq((9L, "a")).toDF("id", "p"), Seq("p"))
    cat.addColumn("t", "x", StringType)
    assert(cat.read("t").select("id", "x")
      .as[(Long, Option[String])].collect().toSeq === Seq((9L, None)))
  }

  test("metadata-only ALTERs record bytesAdded=0: admission never stats the table") {
    val cat = fresh()
    cat.overwriteVersioned("t", Seq((1, "a", 1.0)).toDF("id", "p", "m"), Seq("p"))
    cat.addConstraint("t", "id_pos", "id > 0")     // v2
    cat.renameColumn("t", "m", "metric")           // v3
    cat.alterColumnType("t", "metric", DoubleType) // still double: no-op —
    cat.alterColumnType("t", "id", org.apache.spark.sql.types.LongType) // v4
    cat.addColumn("t", "tag", StringType)          // v5
    cat.dropColumn("t", "tag")                     // v6
    cat.dropConstraint("t", "id_pos")              // v7
    // a zero-byte metadata commit must never count as whole-table bytes
    // against a streaming byte budget (that would force it to admit
    // alone AND pay a full-table stat sweep per poll)
    for (v <- 2L to 7L)
      assert(cat.bytesAddedIn("t", v) === 0L, s"v$v should record 0 bytes")
    assert(cat.bytesAddedIn("t", 1) > 0L, "data commits still record real bytes")
  }

  test("a crashed renameTable resumes from its journal; unrelated renames refuse") {
    val root = Files.createTempDirectory("graft-rnj").toString
    val cat = new ParquetCatalog(spark, root)
    cat.overwriteVersioned("a", Seq((1L, 1.0)).toDF("id", "m"))
    // simulate a crash AFTER the journal write and the versions-dir
    // move but BEFORE the journal delete
    Files.writeString(java.nio.file.Paths.get(root, ".rename-journal"), "a\nb")
    Files.move(java.nio.file.Paths.get(root, ".versions", "a"),
      java.nio.file.Paths.get(root, ".versions", "b"))
    // an unrelated rename refuses while the journal is pending
    cat.overwriteVersioned("c", Seq((2L, 2.0)).toDF("id", "m"))
    val e = intercept[IllegalArgumentException](cat.renameTable("c", "d"))
    assert(e.getMessage.contains("journal"), e.getMessage)
    // re-running the SAME rename completes it and clears the journal
    cat.renameTable("a", "b")
    assert(!Files.exists(java.nio.file.Paths.get(root, ".rename-journal")))
    assert(cat.read("b").select("id").as[Long].head() === 1L)
    assert(!cat.exists("a"))
    // and the now-unblocked unrelated rename proceeds
    cat.renameTable("c", "d")
    assert(cat.read("d").select("id").as[Long].head() === 2L)
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

  test("add/drop resolve names case-insensitively, like every other verb") {
    val cat = fresh()
    cat.overwriteVersioned("t", Seq((1L, "a", 1.0)).toDF("id", "p", "m"), Seq("p"))
    // a case-variant ADD would record a duplicate-modulo-case schema
    // that Spark's resolver then treats as ambiguous — refuse
    intercept[IllegalArgumentException](cat.addColumn("t", "ID", StringType))
    intercept[IllegalArgumentException](cat.addColumn("t", "M", DoubleType))
    // DROP resolves the recorded spelling from a case-variant reference
    val v = cat.dropColumn("t", "M")
    assert(!cat.read("t").columns.contains("m"))
    assert(cat.readVersion("t", v - 1).columns.contains("m"))
    // the dropped-name marker still guards a re-add under EITHER case
    // (mapping off + bytes live in carried files -> refusal)
    intercept[IllegalArgumentException](cat.addColumn("t", "M", DoubleType))
    intercept[IllegalArgumentException](cat.addColumn("t", "m", DoubleType))
    // case-variant partition column refuses to drop
    intercept[IllegalArgumentException](cat.dropColumn("t", "P"))
    // and a genuinely absent name still errors
    intercept[IllegalArgumentException](cat.dropColumn("t", "nope"))
  }
}
