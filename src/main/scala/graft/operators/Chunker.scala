package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap — the
  * context-window/embedding-chunk preparation step of an LLM data
  * pipeline (split each document into `size`-token windows starting
  * every `stride` tokens, so consecutive chunks overlap by
  * `size - stride` tokens).
  *
  * Scale shape: a pure narrow map — tokenize, compute the chunk-index
  * range, `posexplode`, `slice` — built entirely from codegen'd
  * built-ins. NO shuffle, no UDF, no state; 100 TB of documents chunk
  * at scan speed and the output inherits the input's partitioning.
  * Tokenization is the library-wide whitespace convention
  * ([[graft.functions.TextAnalysis.tokenCount]]: `split(trim(text),
  * "\\s+")`), so chunk token counts reconcile exactly with t1/t12's
  * totals.
  */
object Chunker {

  /** Chunk `textCol` into windows of `size` tokens every `stride`
    * tokens. A document with `n <= size` tokens yields exactly one
    * chunk (the whole document); otherwise `1 + ceil((n-size)/stride)`
    * chunks, the last one possibly shorter than `size`. Output: one row
    * per (document, chunk) with `chunk_id` (0-based), `start_tok`
    * (0-based token offset), `n_tokens`, `chunk_text`, plus `carry`
    * columns passed through.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String, size: Int,
      stride: Int, carry: Seq[String] = Nil): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size=$size], got $stride — a stride above " +
        "size would silently drop tokens between consecutive windows")
    val arrLen = org.apache.spark.sql.functions.size _ // param shadows it
    val toks: Column = split(trim(col(textCol)), "\\s+")
    val carryCols = carry.map(col)
    val lastChunk: Column = // index of the final window's start slot
      ceil(greatest(arrLen(col("__toks")) - lit(size), lit(0)).cast("double")
        / stride).cast("int")
    df.select((col(idCol) +: carryCols) :+ toks.as("__toks"): _*)
      .select((col(idCol) +: carryCols) :+ col("__toks") :+
        posexplode(sequence(lit(0), lastChunk)).as(Seq("chunk_id", "__i")): _*)
      .select((col(idCol) +: carryCols) :+
        col("chunk_id") :+
        (col("chunk_id") * stride).as("start_tok") :+
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(size))
          .as("__w"): _*)
      .select((col(idCol) +: carryCols) :+
        col("chunk_id") :+ col("start_tok") :+
        arrLen(col("__w")).cast("long").as("n_tokens") :+
        concat_ws(" ", col("__w")).as("chunk_text"): _*)
  }
}
