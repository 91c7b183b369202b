package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Cross-document exact substring dedup (d14/d15,
  * Dedup.crossDocDupSpans / removeDupSpans) on a hand-computed corpus:
  * keep-first resolution, island merging across overlapping AND
  * adjacent windows, within-doc repeats, and the packed-key guard.
  * n = 8 throughout, matching the gated queries. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, from: Int, to: Int): String =
    (from to to).map(i => s"$prefix$i").mkString(" ")

  // A: w1..w12 (the global-first copy of everything)
  // B: identical to A          -> fully duplicated, one island [1,13)
  // C: x1..x7 then w1..w8      -> tail window dup, island [8,16)
  // D: y1..y10, all unique     -> untouched
  // E: w1..w8 w1..w8           -> windows at pos 1 and 9 dup, ADJACENT
  //                               (9 > prev_end 9 is false) -> ONE
  //                               island [1,17)
  private lazy val corpus = Seq(
    (1L, toks("w", 1, 12)),
    (2L, toks("w", 1, 12)),
    (3L, toks("x", 1, 7) + " " + toks("w", 1, 8)),
    (4L, toks("y", 1, 10)),
    (5L, toks("w", 1, 8) + " " + toks("w", 1, 8))
  ).toDF("doc_id", "text")

  test("islands: keep-first, overlap and adjacency merging, within-doc repeats") {
    val islands = Dedup.crossDocDupSpans(corpus, "doc_id", "text", n = 8)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(islands === Seq(
      (2L, 1, 13),  // whole doc: 5 overlapping windows merged
      (3L, 8, 16),  // only the w-tail
      (5L, 1, 17)   // two ADJACENT dup windows merged into one island
    ))
  }

  test("rewrite removes exactly the island tokens, reconstructs the rest") {
    val clean = Dedup.removeDupSpans(corpus, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("text_clean"), r.getAs[Long]("n_tokens_clean"))).toMap
    assert(clean(1L) === (toks("w", 1, 12), 12L)) // global first: untouched
    assert(clean(3L) === (toks("x", 1, 7), 7L))
    assert(clean(4L) === (toks("y", 1, 10), 10L))
    // B and E are fully duplicated text: no kept tokens, no output row
    assert(!clean.contains(2L) && !clean.contains(5L))
  }

  test("short docs produce no windows and no islands") {
    val short = Seq((1L, toks("w", 1, 7)), (2L, toks("w", 1, 7)))
      .toDF("doc_id", "text") // 7 tokens < n=8: identical but unwindowable
    assert(Dedup.crossDocDupSpans(short, "doc_id", "text", n = 8).count() === 0)
  }

  test("packed-key bounds fail loudly, not silently mis-ordered") {
    val bad = Seq((-1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (7L, (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.crossDocDupSpans(bad, "doc_id", "text", n = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("packed-key bounds")),
      s"expected loud bounds failure, got: $e")
  }
}
