package graft

import graft.operators.EditJoin
import org.apache.spark.sql.functions._

/** Pins the deletion-neighborhood candidate generation (EditJoin)
  * against the quadratic within-block self-join it replaces in j11/er1:
  * after the exact bounded-levenshtein verify, the two forms emit the
  * IDENTICAL pair set (same ids, same dist) — including insertion,
  * deletion, substitution neighbors, cross-block isolation, and strings
  * at distance 2 that the key join may surface as false candidates. */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // one block of near-identical keys (the degenerate-prefix shape)
    (1L, "Customer#000000001", "b1"),
    (2L, "Customer#000000002", "b1"), // substitution of 1
    (3L, "Customer#00000001", "b1"),  // deletion of 1
    (4L, "Customer#0000000012", "b1"), // insertion of 1? (dist 2 from 1)
    (5L, "Customer#000000021", "b1"), // transposition of 2 & 1 digits: dist 2 from 1
    (6L, "Customer#000000001x", "b1"), // insertion at end of 1
    // a second block: same names must NOT pair across blocks
    (7L, "Customer#000000001", "b2"),
    (8L, "Customer#000000009", "b2"),
    // short strings and the empty string
    (9L, "a", "b3"),
    (10L, "", "b3"),
    (11L, "b", "b3"),
    (12L, "ab", "b3")
  ).toDF("id", "name", "blk")

  private def verify(cands: org.apache.spark.sql.DataFrame) =
    cands
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1))
      .filter(col("dist").between(0, 1))
      .select("id_a", "id_b", "dist")

  test("del-1 candidates verify to exactly the quadratic block join's pairs") {
    val a = rows.select(col("blk"), col("id").as("id_a"), col("name").as("name_a"))
    val b = rows.select(col("blk"), col("id").as("id_b"), col("name").as("name_b"))
    val quadratic = a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1))
      .filter(col("dist").between(0, 1))
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet

    val viaKeys = verify(
      EditJoin.candidatesLev1(rows, "blk", "id", "name"))
      .as[(Long, Long, Int)].collect().toSet

    assert(viaKeys === quadratic)
    // sanity: the fixture actually exercises matches in both directions
    assert(quadratic.contains((1L, 2L, 1)))  // substitution
    assert(quadratic.contains((1L, 3L, 1)))  // deletion
    assert(quadratic.contains((1L, 6L, 1)))  // insertion
    assert(quadratic.contains((9L, 10L, 1))) // 1-char vs empty
    assert(!quadratic.exists { case (x, y, _) => x == 1L && y == 7L }) // cross-block
  }

  test("candidate set is a superset that still contains every lev<=1 pair per key theory") {
    // every verified pair must appear among raw candidates exactly once
    val cands = EditJoin.candidatesLev1(rows, "blk", "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(cands.distinct.length === cands.length) // distinct() holds
  }
}
