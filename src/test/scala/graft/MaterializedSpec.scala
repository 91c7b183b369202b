package graft

import graft.storage.ParquetCatalog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incrementally-maintained materialized aggregates: refresh folds the
  * change feed's SIGNED deltas into the view state — O(delta) reads,
  * one group-key shuffle, never a source re-scan — and decimal sum
  * state makes the incremental result BIT-EQUAL to a full recompute.
  * The txn registry doubles as the refresh watermark: caught-up and
  * replayed refreshes commit nothing. */
class MaterializedSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): ParquetCatalog =
    new ParquetCatalog(spark, Files.createTempDirectory("graft-mv").toString)

  private def recompute(cat: ParquetCatalog, src: String) =
    cat.read(src).groupBy("p")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("m").cast("decimal(28,6)")).as("sum_m"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("p", "n_rows", "sum_m")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map { case (p, n, s) => (p, n, s.stripTrailingZeros) }.toSet

  test("bootstrap refresh equals a direct aggregate of the source") {
    val cat = fresh()
    cat.overwriteVersioned("s",
      Seq((1L, "a", 1.25), (2L, "a", 2.5), (3L, "b", 4.0)).toDF("id", "p", "m"))
    cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    assert(rows(cat.read("mv")) === rows(recompute(cat, "s")))
  }

  test("incremental refresh across append, merge, and delete is bit-equal to recompute") {
    val cat = fresh()
    cat.overwriteVersioned("s",
      Seq((1L, "a", 1.25), (2L, "a", 2.5), (3L, "b", 4.0)).toDF("id", "p", "m"))
    cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    // three commits pile up before the next refresh
    cat.appendVersioned("s", Seq((4L, "b", 8.125), (5L, "c", 16.0)).toDF("id", "p", "m"))
    cat.upsertVersioned("s", Seq((1L, "a", 100.0), (3L, "c", 4.0)).toDF("id", "p", "m"),
      Seq("id")) // update in place + group move b->c
    cat.deleteVersioned("s", col("id") === 2L)
    val v = cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    assert(rows(cat.read("mv")) === rows(recompute(cat, "s")),
      "incremental state must equal the full recompute exactly")
    // caught-up refresh commits nothing
    assert(cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m")) === v)
    assert(cat.currentVersion("mv") === v)
  }

  test("a group whose count reaches zero leaves the view") {
    val cat = fresh()
    cat.overwriteVersioned("s", Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "p", "m"))
    cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    cat.deleteVersioned("s", col("p") === "b")
    cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    assert(cat.read("mv").select("p").as[String].collect().toSeq === Seq("a"))
  }

  test("racing refreshes commit the window exactly once (CAS + watermark)") {
    val cat = fresh()
    cat.overwriteVersioned("s", Seq((1L, "a", 1.0)).toDF("id", "p", "m"))
    cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    cat.appendVersioned("s", Seq((2L, "b", 2.0)).toDF("id", "p", "m"))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = (0 until 2).map { _ =>
      new Thread(() => {
        barrier.await()
        // loser of the CAS throws; a retry then sees the watermark and
        // no-ops — either way the window folds in exactly once
        try cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
        catch { case _: graft.storage.ConcurrentWriteException =>
          cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
        }
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(rows(cat.read("mv")) === rows(recompute(cat, "s")),
      "a double-applied window would double partition b's count")
  }

  test("restoreAsOf rewinds to the wall-clock state as a new commit") {
    val cat = fresh()
    cat.overwriteVersioned("s", Seq((1L, "a", 1.0)).toDF("id", "p", "m"))
    cat.appendVersioned("s", Seq((2L, "b", 2.0)).toDF("id", "p", "m"))
    val t1 = cat.commitTimestamp("s", 1).get
    cat.restoreAsOf("s", t1)
    assert(cat.read("s").count() === 1)
    assert(cat.history("s").filter(col("operation") === "restore").count() === 1)
  }

  test("refresh never re-reads carried source files (O(delta) pinned)") {
    val cat = fresh()
    cat.overwriteVersioned("s",
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "p", "m"), Seq("p"))
    cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    cat.appendVersioned("s", Seq((3L, "b", 3.0)).toDF("id", "p", "m"), Seq("p"))
    val before = cat.manifestFiles("s", 1).toSet
    val after = cat.manifestFiles("s", 2).toSet
    val feed = cat.tableChanges("s", 1, 2, Seq("id"))
    assert(feed.inputFiles.forall(f => !before.exists(f.endsWith)),
      "the refresh window's feed must open only the files the commit added")
    assert((after -- before).nonEmpty)
    cat.refreshMaterialized("s", "mv", Seq("id"), Seq("p"), Seq("m"))
    assert(rows(cat.read("mv")) === rows(recompute(cat, "s")))
  }
}
