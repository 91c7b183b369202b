package graft

import graft.queries.Pins
import org.apache.spark.sql.functions._

/** Pins.symmetricDiffCount must equal the exceptAll form it replaced
  * (the k25/k30/k31/k32 mismatch pins) — multiset semantics, duplicate
  * rows, NULL fields, and decimal columns included. */
class PinsSpec extends SparkSpec {
  import spark.implicits._

  private def except2(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("equal multisets (with duplicates) diff to zero") {
    val a = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y"), (1L, "x"), (1L, "x")).toDF("k", "v")
    assert(Pins.symmetricDiffCount(a, b) === 0L)
    assert(Pins.symmetricDiffCount(a, b) === except2(a, b))
  }

  test("multiset multiplicity differences count per copy, both directions") {
    val a = Seq((1L, "x"), (1L, "x"), (1L, "x"), (3L, "z")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    // a has 2 extra (1,x) + (3,z); b has (2,y): 4 total
    assert(Pins.symmetricDiffCount(a, b) === 4L)
    assert(Pins.symmetricDiffCount(a, b) === except2(a, b))
  }

  test("NULL fields compare equal, matching exceptAll semantics") {
    val a = Seq((Some(1L), Option.empty[String]), (None, Some("y")))
      .toDF("k", "v")
    val b = Seq((Option.empty[Long], Some("y")), (Some(1L), None))
      .toDF("k", "v")
    assert(Pins.symmetricDiffCount(a, b) === 0L)
    assert(Pins.symmetricDiffCount(a, b) === except2(a, b))
  }

  test("decimal + string mixed rows (the k30/k31 pin shape)") {
    val a = Seq(("O", 10L), ("F", 20L)).toDF("s", "n")
      .select(col("s"), col("n").cast("decimal(28,6)").as("n"))
    val b = Seq(("O", 10L), ("F", 21L)).toDF("s", "n")
      .select(col("s"), col("n").cast("decimal(28,6)").as("n"))
    assert(Pins.symmetricDiffCount(a, b) === 2L)
    assert(Pins.symmetricDiffCount(a, b) === except2(a, b))
  }

  test("column-name mismatch is refused loudly") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("k", "w")
    intercept[IllegalArgumentException](Pins.symmetricDiffCount(a, b))
  }
}
