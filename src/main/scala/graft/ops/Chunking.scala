package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => arrSize}

/** Context-window chunking — the tokenize→window stage that precedes
  * sequence packing in an LLM training pipeline: every document is
  * cut into fixed-size token windows with a configurable stride
  * (stride < size ⇒ overlapping windows, the standard way to keep
  * boundary context when a document exceeds the model's context
  * length).
  *
  * Scale shape: a pure map-side generate — tokenize, enumerate window
  * starts with `sequence`, `posexplode`, slice. No shuffle, no state,
  * no window functions; a document's chunks are produced inside its
  * own input partition, so the operator scales with input bytes and
  * the output order within a partition is deterministic. At 100 TB
  * the only knob that matters is the output row multiplier
  * ceil(n_tokens/stride), visible up front from the token stats.
  */
object Chunking {

  /** (doc_id, chunk_idx, n_tokens, chunk_text) for every window:
    * chunk i covers tokens [i·stride, i·stride + size). The final
    * window is partial (n_tokens < size) unless the document length
    * is congruent; a document shorter than `size` yields exactly one
    * chunk. Empty/whitespace-only text still tokenizes to one
    * element under the split-on-space contract ([[TextStats.tokens]])
    * and yields one 1-token chunk — chunk count is never zero, which
    * downstream packing relies on. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val toks = df.select(col(idCol).as("doc_id"),
      TextStats.tokens(col(textCol)).as("ts"))
    toks
      .select(col("doc_id"), col("ts"),
        posexplode(sequence(lit(0),
          greatest(arrSize(col("ts")) - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        slice(col("ts"), col("col") + 1, lit(size)).as("cts"))
      .select(col("doc_id"), col("chunk_idx"),
        arrSize(col("cts")).cast("long").as("n_tokens"),
        array_join(col("cts"), " ").as("chunk_text"))
  }

  /** Chunk-level exact dedup report: distinct window payloads vs
    * total windows (the near-boilerplate measure over sliding
    * windows). One hash aggregation over 8-byte window keys. */
  def chunkDupStats(chunks: DataFrame): DataFrame =
    chunks.agg(
      count(lit(1)).as("n_chunks"),
      countDistinct(xxhash64(col("chunk_text"))).as("n_distinct_chunks"))
}
