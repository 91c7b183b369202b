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
}
