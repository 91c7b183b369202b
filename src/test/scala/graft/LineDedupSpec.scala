package graft

import graft.operators.LineDedup
import org.apache.spark.sql.functions._

/** Semantics of corpus-wide boilerplate line removal: document
  * frequency counts distinct documents (within-document repeats don't
  * inflate it), the threshold is inclusive, surviving lines keep their
  * order, fully-templated documents collapse to the empty string, and
  * whitespace-only lines are exempt from classification.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minDf: Long) =
    LineDedup
      .removeBoilerplateLines(rows.toDF("id", "text"), "id", "text", minDf)
      .orderBy("id")
      .as[(Long, String, Long, Long)]
      .collect()

  test("hot lines vanish from every document, order preserved") {
    val out = run(Seq(
      (1L, "HEADER\nalpha\nFOOTER\nbeta"),
      (2L, "HEADER\ngamma\nFOOTER"),
      (3L, "HEADER\ndelta\nFOOTER\nepsilon\nzeta")), minDf = 3)
    assert(out === Seq(
      (1L, "alpha\nbeta", 2L, 2L),
      (2L, "gamma", 1L, 2L),
      (3L, "delta\nepsilon\nzeta", 3L, 2L)))
  }

  test("threshold is inclusive: df == minDf removed, df == minDf - 1 kept") {
    val out = run(Seq(
      (1L, "twice\nthrice\nown1"),
      (2L, "twice\nthrice\nown2"),
      (3L, "thrice\nown3")), minDf = 3)
    // "thrice" (df 3) removed; "twice" (df 2) kept
    assert(out.map(_._2) === Seq("twice\nown1", "twice\nown2", "own3"))
  }

  test("within-document repetition does not inflate document frequency") {
    val out = run(Seq(
      (1L, "echo\necho\necho\necho\nsolo"),
      (2L, "other")), minDf = 2)
    // "echo" appears 4x but only in one document: df = 1, kept
    assert(out.head._2 === "echo\necho\necho\necho\nsolo")
  }

  test("fully-templated document collapses to empty text, counted") {
    val out = run(Seq(
      (1L, "BANNER\nLEGAL"),
      (2L, "BANNER\nLEGAL"),
      (3L, "BANNER\nLEGAL\ncontent")), minDf = 3)
    assert(out.map(r => (r._2, r._3, r._4)) === Seq(
      ("", 0L, 2L), ("", 0L, 2L), ("content", 1L, 2L)))
  }

  test("whitespace-only lines are never boilerplate") {
    val out = run(Seq(
      (1L, "a\n\nb"),
      (2L, "c\n\nd"),
      (3L, "e\n\nf")), minDf = 2)
    assert(out.map(_._2) === Seq("a\n\nb", "c\n\nd", "e\n\nf"))
  }
}
