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

  /** Sequence packing — assign every chunk to the fixed-`seqLen`
    * context window ("pack") its FIRST token lands in when the
    * chunks of a shard are concatenated in deterministic
    * (doc_id, chunk_idx) order and the token stream is cut every
    * `seqLen` tokens. This is concat-and-split packing (the standard
    * packed-dataset layout): no padding waste, a chunk may straddle
    * a cut, and the assignment is a pure function of the ordered
    * prefix sums — reproducible forever.
    *
    * Scale shape: chunks are hash-sharded by doc so the running-sum
    * window is per-shard (each shard's state is one cumulative
    * counter over ITS chunks, never the corpus); one window shuffle.
    * `shards` is the parallelism knob — at 100 TB you size it like
    * shuffle partitions, and packs are globally unique via
    * (shard, pack_in_shard). */
  def packChunks(chunks: DataFrame, seqLen: Int, shards: Int = 64,
      shardExpr: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    require(seqLen > 0 && shards > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      // default shard: seeded hash (decorrelates from id patterns);
      // pass an explicit portable expression when another engine must
      // re-derive the assignment (e.g. pmod(doc_id, shards))
      .withColumn("shard", shardExpr.getOrElse(
        pmod(xxhash64(col("doc_id")), lit(shards.toLong))))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("shard"), col("doc_id"), col("chunk_idx"),
        col("n_tokens"),
        expr(s"cum_before div ${seqLen}L").as("pack_id"),
        pmod(col("cum_before"), lit(seqLen.toLong)).as("pack_pos"))
      .orderBy("shard", "doc_id", "chunk_idx")
  }

  /** Packing efficiency accounting per shard: packs consumed by the
    * concatenated stream (ceil(tokens/seqLen) — NOT max(pack_id)+1,
    * which misses a final pack no chunk starts in) vs the tokens
    * placed (utilization = tokens / (packs·seqLen)). With
    * concat-and-split packing every pack but each shard's ragged
    * tail is full by construction, so this reports how well `shards`
    * balances. */
  def packStats(packed: DataFrame, seqLen: Int): DataFrame =
    packed.groupBy("shard")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_tokens").as("n_tokens"))
      .withColumn("n_packs",
        expr(s"(n_tokens + ${seqLen - 1}) div ${seqLen}L"))
      .withColumn("utilization",
        graft.det.Sig.sig5(col("n_tokens").cast("double") /
          (col("n_packs") * seqLen.toLong).cast("double")))
      .select("shard", "n_chunks", "n_tokens", "n_packs", "utilization")
      .orderBy("shard")
}
