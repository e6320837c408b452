package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping token-window chunking — the step between
  * curation and tokenization in a pretraining / retrieval pipeline:
  * long documents become `size`-token windows advancing by `stride`
  * tokens (`size - stride` tokens of overlap preserve context across
  * boundaries, the standard RAG / long-doc training layout).
  *
  * Chunk math: a document of `n > 0` tokens yields
  * `1 + max(0, ceil((n - size) / stride))` chunks; chunk `k` covers
  * tokens `[k·stride, k·stride + size)`, the last chunk may be short,
  * and `n = 0` documents yield nothing. Every rule is replayed
  * verbatim by the DuckDB oracle (q_chunk_documents).
  *
  * Scale shape: pure per-row expression work — tokenize, one
  * `explode(sequence(...))`, a slice per chunk. No shuffle, no join,
  * no state; chunking 100 TB is scan-bound and embarrassingly
  * parallel. Output volume is input × (1 + overlap ratio), so the
  * expansion factor is a planning constant, not data-dependent.
  */
object Chunker {

  /** Chunk `docs` (`doc_id`, `text`) into overlapping token windows.
    * Output: `doc_id`, `chunk_id` (0-based), `n_tokens`, `chunk_text`.
    */
  def chunk(docs: DataFrame, sizeTokens: Int, stride: Int): DataFrame = {
    require(sizeTokens > 0 && stride > 0 && stride <= sizeTokens,
      s"chunk: need 0 < stride <= size, got size=$sizeTokens stride=$stride")
    val toks = filter(TextAnalysis.tokens(col("text")), t => t =!= "")
    docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0), greatest(lit(0),
        ceil((col("n") - sizeTokens) / lit(stride.toDouble)).cast("int")))))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(sizeTokens), col("n") - col("chunk_id") * stride)
          .as("n_tokens"),
        concat_ws(" ",
          slice(col("toks"), col("chunk_id") * stride + 1, lit(sizeTokens)))
          .as("chunk_text"))
  }
}
