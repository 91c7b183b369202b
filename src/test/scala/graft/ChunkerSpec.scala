package graft

import graft.operators.Chunker
import org.apache.spark.sql.functions._

/** Contract tests for overlapping context-window chunking: coverage
  * (every token lands in some chunk), window geometry (starts every
  * `stride`, length ≤ `size`, only the last chunk short), overlap
  * reconciliation against the whole-document token count, and loud
  * rejection of a token-dropping stride. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 toks → 4 chunks
    (2L, "alpha beta gamma"),                        // n < size → 1 chunk
    (3L, (1 to 32).map(i => s"t$i").mkString(" ")),  // n == size → 1 chunk
    (4L, (1 to 33).map(i => s"u$i").mkString(" ")),  // n == size+1 → 2
    (5L, "")                                         // degenerate
  ).toDF("doc_id", "text")

  private def chunks = Chunker.chunk(docs, "doc_id", "text",
    size = 32, stride = 24)

  test("window geometry: starts at i*stride, full except the last") {
    val rows = chunks.orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "n_tokens")
      .as[(Long, Int, Int, Long)].collect()
    // doc 1: n=100 → lastChunk = ceil(68/24) = 3 → 4 chunks
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(d1.map(_._3).toSeq == Seq(0, 24, 48, 72))
    assert(d1.map(_._4).toSeq == Seq(32L, 32L, 32L, 28L))
    assert(rows.count(_._1 == 2L) == 1 && rows.count(_._1 == 3L) == 1)
    val d4 = rows.filter(_._1 == 4L)
    assert(d4.map(_._4).toSeq == Seq(32L, 9L)) // tokens 25..33
  }

  test("coverage and overlap reconcile with whole-doc token counts") {
    // sum of chunk tokens = doc tokens + (nChunks-1)*overlap when every
    // non-final window is full — exact for stride-covered docs
    val agg = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("chunk_toks"), count(lit(1)).as("n_chunks"))
      .join(docs.select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("doc_toks")),
        "doc_id")
      .as[(Long, Long, Long, Int)].collect()
    agg.foreach { case (id, chunkToks, nChunks, docToks) =>
      assert(chunkToks == docToks + (nChunks - 1) * 8,
        s"doc $id: $chunkToks vs $docToks + ${nChunks - 1}*8")
    }
  }

  test("chunk_text round-trips the token stream") {
    val joined = chunks.filter(col("doc_id") === 1L)
      .orderBy("chunk_id").select("chunk_text")
      .as[String].collect()
    // stitch chunks dropping each window's 8-token overlap prefix
    val stitched = joined.head +: joined.tail.map(
      _.split(" ").drop(8).mkString(" "))
    assert(stitched.mkString(" ") ==
      (1 to 100).map(i => s"w$i").mkString(" "))
  }

  test("carry columns pass through; empty text yields one chunk") {
    val out = Chunker.chunk(docs.withColumn("source", lit("s")),
      "doc_id", "text", size = 4, stride = 2, carry = Seq("source"))
    assert(out.columns.toSeq ==
      Seq("doc_id", "source", "chunk_id", "start_tok", "n_tokens", "chunk_text"))
    assert(out.filter(col("doc_id") === 5L).count() == 1)
  }

  test("token-dropping stride is rejected loudly") {
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "doc_id", "text", size = 8, stride = 9)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "doc_id", "text", size = 0, stride = 1)
    }
  }
}
