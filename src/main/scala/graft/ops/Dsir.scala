package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** DSIR-style importance weighting for data selection (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw-corpus document by how much more
  * likely its tokens are under a small TARGET distribution (the
  * blessed domain — wiki/books/curated) than under the raw source
  * distribution, then keep the top-weighted documents. The importance
  * weight is the unigram log-likelihood ratio
  * `w(doc) = Σ_tokens ln(p_target(t) / p_source(t))` with
  * Laplace-smoothed per-slice probabilities over the shared observed
  * vocabulary (the same (c + 0.5)/(n + 0.5k) smoothing as
  * [[Drift]] — every float step is the identical IEEE op on both
  * engines). The paper buckets features by hashing for fixed-width
  * state; here the token→ratio table is itself distributed, so no
  * bucketing is needed and the weights are exact.
  *
  * Scale shape: one (token → per-slice counts) hash aggregation with
  * map-side combine builds the ratio table (corpus-vocab sized,
  * distributed — never collected); totals ride a 1-row broadcast
  * crossJoin. Document scoring joins the exploded token stream
  * against that table on the 8-byte-hashable token key and sums per
  * doc — two corpus-scale shuffles total (table build, score join).
  * Hot tokens (stopwords) skew the score join's shuffle; AQE's
  * skew-join splitting handles the oversized partitions, and the
  * ratio table itself stays perfectly balanced. Selection takes the
  * head via orderBy+limit (TakeOrderedAndProject — the distributed
  * partial top-k), never a full-corpus rank window; ranking compares
  * sig5-ROUNDED weights with doc-id tie-break, the engine contract
  * for discrete decisions. */
object Dsir {

  /** Per-document importance weights for every NON-target document:
    * (doc_id, n_tokens, w) with `w` the sig5-rounded unigram
    * log-likelihood ratio vs the target slice. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetSlice: Column): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), targetSlice.as("tgt"),
      explode(TextStats.tokens(col(textCol))).as("token"))
    val counts = tok.groupBy("token").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ca"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cb"))
    val totals = counts.agg(sum("ca").cast("double").as("na"),
      sum("cb").cast("double").as("nb"),
      count(lit(1)).cast("double").as("k"))
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("token"),
        log(((col("ca") + 0.5) / (col("na") + col("k") * 0.5)) /
            ((col("cb") + 0.5) / (col("nb") + col("k") * 0.5))).as("lr"))
    tok.where(!col("tgt"))
      .join(lr, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sig5(sum("lr")).as("w"))
  }

  /** Top-`topK` raw documents by importance weight — the selection
    * step. Head via orderBy+limit (distributed partial top-k); rank
    * stamped after the limit over ≤ topK rows. */
  def topByImportance(df: DataFrame, idCol: String, textCol: String,
      targetSlice: Column, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = importanceWeights(df, idCol, textCol, targetSlice)
      .orderBy(col("w").desc, col("doc_id")).limit(topK)
    w.withColumn("rnk", row_number()
        .over(Window.orderBy(col("w").desc, col("doc_id"))).cast("long"))
      .select("rnk", "doc_id", "n_tokens", "w")
      .orderBy("rnk")
  }
}
