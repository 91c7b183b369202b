package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (t28) against an independent in-test
  * reimplementation of the formula on a hand-built corpus. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 4 docs; terms "q" (the query term) with varying tf and dl.
  // doc 1: q appears 3x in 6 tokens; doc 2: 1x in 6; doc 3: 1x in 12;
  // doc 4: no q.
  private lazy val corpus = Seq(
    (1L, "q a q b q c"),
    (2L, "q a b c d e"),
    (3L, "q a b c d e f g h i j k"),
    (4L, "a b c d e f")
  ).toDF("doc_id", "text")

  private def expectedScore(tf: Long, dl: Long, df: Long, nDocs: Long,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    val comp = idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    // mirror the operator: component rounded to 6 dp, exact sum
    BigDecimal(comp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("bm25TopK ranks by tf and dl exactly as the formula says") {
    val res = InvertedIndex.bm25TopK(corpus, "doc_id", "text", Seq("q"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    // df("q") = 3, N = 4, avgdl = (6+6+12+6)/4 = 7.5
    val e1 = expectedScore(3, 6, 3, 4, 7.5)
    val e2 = expectedScore(1, 6, 3, 4, 7.5)
    val e3 = expectedScore(1, 12, 3, 4, 7.5)
    // more occurrences beat fewer; same tf, shorter doc beats longer
    assert(e1 > e2 && e2 > e3)
    assert(res.map(t => (t._1, t._2)) === Seq((1, 1L), (2, 2L), (3, 3L)))
    res.zip(Seq(e1, e2, e3)).foreach { case ((_, id, got), want) =>
      assert(math.abs(got - want) < 1e-9, s"doc $id: $got != $want")
    }
  }

  test("multi-term scores sum per doc and k truncates") {
    val multi = Seq(
      (1L, "x y a b"),
      (2L, "x a b c"),
      (3L, "y a b c"),
      (4L, "a b c d")
    ).toDF("doc_id", "text")
    val res = InvertedIndex.bm25TopK(multi, "doc_id", "text",
      Seq("x", "y"), k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // doc 1 matches both terms -> highest; k=2 keeps exactly two rows;
    // docs 2 and 3 tie on score (same tf/dl/df) -> doc_id 2 wins rank 2
    assert(res === Seq((1, 1L), (2, 2L)))
  }
}
