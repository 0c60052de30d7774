package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split long documents into overlapping fixed-size
  * token windows — the complement of [[Packing]] (packing joins short
  * docs up to a budget; chunking cuts long docs down to one). Standard
  * prep for context-window-bounded training and for embedding long
  * documents piecewise.
  *
  * Scale shape: pure per-row generate-and-explode in the scan stage — no
  * shuffle, no state; output size is input tokens × (window/stride)
  * overlap factor, linear in the corpus.
  */
object Chunking {

  /** Cut each document into whitespace-token windows of `window` tokens,
    * starting every `stride` tokens (stride < window ⇒ overlapping
    * chunks). Every token lands in ≥1 chunk: starts are 0, stride, 2·stride,
    * …, up to the smallest start covering the tail; a document of ≤ window
    * tokens yields exactly one chunk. Output: one row per (doc, chunk)
    * with the chunk index, its text, and its token count. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkByTokens: need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    val nTok = size(toks).cast("long")
    // number of stride-steps AFTER the first chunk: ceil((nTok-window)/stride).
    // Column./ is DOUBLE division in Spark — cast back to long (exact for
    // any realistic token count; truncation == floor for positives).
    val extra = when(nTok <= window, lit(0L))
      .otherwise(((nTok - window + (stride - 1)) / stride).cast("long"))
    df.select(col(idCol), toks.as("__toks"), nTok.as("__n"),
        explode(sequence(lit(0L), extra)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)), " ").as("chunk_text"),
        least(lit(window.toLong), col("__n") - col("chunk_id") * stride)
          .as("n_chunk_tokens"))
  }
}
