package graft

import graft.operators.Upsert
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "Other", 10.0), (2L, "AI/ML", 20.0), (3L, "DevOps", 30.0)
  ).toDF("id", "category", "metric")

  private def source = Seq(
    (1L, "Web", 11.0), (2L, "Data", 22.0), (4L, "Systems", 44.0)
  ).toDF("id", "category", "metric")

  test("merge updates matched, inserts new, keeps unmatched") {
    val out = Upsert.merge(target, source, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out === Seq(
      (1L, "Web", 11.0),     // matched -> source wins
      (2L, "Data", 22.0),    // matched -> source wins
      (3L, "DevOps", 30.0),  // target-only -> kept
      (4L, "Systems", 44.0)) // source-only -> inserted
    )
  }

  test("smart merge preserves good classifications, refreshes metrics") {
    val out = Upsert.merge(target, source, Seq("id"),
      smartCases = Map("category" -> Upsert.keepUnlessPlaceholder("Other")))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out(0) === ((1L, "Web", 11.0)))   // 'Other' replaced
    assert(out(1) === ((2L, "AI/ML", 22.0))) // good category kept, metric fresh
  }

  test("insert-only merge never updates matched rows") {
    val out = Upsert.merge(target, source, Seq("id"), insertOnly = true)
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out(0) === ((1L, "Other", 10.0)))
    assert(out(3) === ((4L, "Systems", 44.0)))
  }

  test("merge is idempotent: re-merging the same source is a no-op") {
    val once = Upsert.merge(target, source, Seq("id"))
    val twice = Upsert.merge(once, source, Seq("id"))
    assert(twice.orderBy("id").collect() === once.orderBy("id").collect())
  }

  test("composite keys match on all key columns") {
    val t = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "v")
    val s = Seq((1L, "b", 20.0), (2L, "a", 30.0)).toDF("k1", "k2", "v")
    val out = Upsert.merge(t, s, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, String, Double)].collect()
    assert(out === Seq((1L, "a", 1.0), (1L, "b", 20.0), (2L, "a", 30.0)))
  }

  test("schema misalignment is rejected") {
    val bad = Seq((1L, "x")).toDF("id", "category")
    assertThrows[IllegalArgumentException] {
      Upsert.merge(target, bad, Seq("id"))
    }
  }

  test("extra source columns are rejected unless evolveSchema") {
    val extra = Seq((1L, "Web", 11.0, "fresh")).toDF("id", "category", "metric", "note")
    assertThrows[IllegalArgumentException] {
      Upsert.merge(target, extra, Seq("id"))
    }
  }

  test("evolveSchema appends new source columns, null where untouched") {
    val extra = Seq((1L, "Web", 11.0, "m1"), (4L, "Sys", 44.0, "m4"))
      .toDF("id", "category", "metric", "note")
    val out = Upsert.merge(target, extra, Seq("id"), evolveSchema = true)
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("note")).toSeq ===
      Seq("m1", null, null, "m4")) // matched + inserted get it; target-only null
    assert(out(0).getAs[String]("category") === "Web")
  }

  test("evolveSchema passes dropped target columns through") {
    val narrow = Seq((1L, 11.0), (4L, 44.0)).toDF("id", "metric")
    val out = Upsert.merge(target, narrow, Seq("id"), evolveSchema = true)
      .orderBy("id").collect()
    // category survives for pre-existing rows, null for the inserted row
    assert(out.map(_.getAs[String]("category")).toSeq ===
      Seq("Other", "AI/ML", "DevOps", null))
    assert(out.map(_.getAs[Double]("metric")).toSeq === Seq(11.0, 20.0, 30.0, 44.0))
  }

  test("evolveSchema add+drop+reorder in one merge") {
    // reordered columns, category dropped, note added
    val src = Seq((99.0, 2L, "n2"), (55.0, 5L, "n5")).toDF("metric", "id", "note")
    val out = Upsert.merge(target, src, Seq("id"), evolveSchema = true)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L, 3L, 5L))
    assert(out(1).getAs[Double]("metric") === 99.0)  // matched by name, not position
    assert(out(1).getAs[String]("category") === "AI/ML")
    assert(out(1).getAs[String]("note") === "n2")
    assert(out(3).getAs[String]("category") === null)
    // evolved schema order: target columns first, new columns appended
    assert(out.head.schema.fieldNames.toSeq === Seq("id", "category", "metric", "note"))
  }

  test("smartCases keyed on an unresolvable column fails loudly") {
    // misspelled column
    val e1 = intercept[IllegalArgumentException] {
      Upsert.merge(target, source, Seq("id"),
        smartCases = Map("catgory" -> Upsert.keepUnlessPlaceholder("Other")))
    }
    assert(e1.getMessage.contains("catgory"))
    // evolved-in (source-only) column: resolver would be silently ignored
    val extra = Seq((1L, "Web", 11.0, "m1")).toDF("id", "category", "metric", "note")
    val e2 = intercept[IllegalArgumentException] {
      Upsert.merge(target, extra, Seq("id"), evolveSchema = true,
        smartCases = Map("note" -> Upsert.additive))
    }
    assert(e2.getMessage.contains("note"))
    // evolved-away (target-only) column passes through, never resolved
    val narrow = Seq((1L, 11.0)).toDF("id", "metric")
    val e3 = intercept[IllegalArgumentException] {
      Upsert.merge(target, narrow, Seq("id"), evolveSchema = true,
        smartCases = Map("category" -> Upsert.keepUnlessPlaceholder("Other")))
    }
    assert(e3.getMessage.contains("category"))
  }

  test("evolveSchema with insertOnly: matched rows stay null in new columns") {
    val src = Seq((1L, "X", 0.0, "m1"), (4L, "Sys", 44.0, "m4"))
      .toDF("id", "category", "metric", "note")
    val out = Upsert.merge(target, src, Seq("id"),
      insertOnly = true, evolveSchema = true).orderBy("id").collect()
    assert(out(0).getAs[String]("category") === "Other") // kept
    assert(out(0).getAs[String]("note") === null)        // target row had no note
    assert(out(3).getAs[String]("note") === "m4")        // inserted row carries it
  }

  test("changeFeed: unchanged and target-only keys emit nothing; updates emit both images") {
    import spark.implicits._
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    val source = Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)).toDF("id", "v")
    val feed = graft.operators.Upsert.changeFeed(target, source, Seq("id"))
      .orderBy("id", "_change_type")
      .as[(Long, String, Double)].collect().toSeq
    assert(feed === Seq(
      (3L, "update_postimage", 33.0),
      (3L, "update_preimage", 30.0),
      (4L, "insert", 40.0)
    ).sortBy(r => (r._1, r._2)))
  }

  test("changeFeed: NULL keys null-safe-match — an update, never a phantom insert") {
    import spark.implicits._
    val target = Seq((Option.empty[Long], 1.0), (Some(2L), 2.0)).toDF("id", "v")
    val source = Seq((Option.empty[Long], 9.0)).toDF("id", "v")
    val feed = graft.operators.Upsert.changeFeed(target, source, Seq("id"))
      .orderBy("_change_type").collect()
    assert(feed.map(_.getString(1)).toSeq ==
      Seq("update_postimage", "update_preimage"))
    assert(feed.forall(_.isNullAt(0)))
  }

  test("changeFeed: null-safe compare — null->value is an update, null->null is not") {
    import spark.implicits._
    val target = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "v")
    val source = Seq((1L, Option.empty[Double]), (2L, Some(2.0))).toDF("id", "v")
    val feed = graft.operators.Upsert.changeFeed(target, source, Seq("id"))
      .orderBy("id", "_change_type").collect()
    assert(feed.length == 2)
    assert(feed.map(_.getLong(0)).toSeq == Seq(2L, 2L))
  }
}
