package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Substring-level exact-duplication detection — the token-span twin
  * of document dedup (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022): find every maximal token span
  * of length ≥ `gram` that occurs more than once in the corpus, and
  * report per-document how much of the text is duplicated. Document
  * near-dup (Jaccard) misses the boilerplate case — a license header
  * pasted into a million otherwise-distinct files — which is exactly
  * what span-level detection catches.
  *
  * The reference paper builds a suffix array; the Spark-native shape
  * is the n-gram position index: a token position is "duplicated"
  * iff the `gram`-token window starting there occurs ≥ `minOcc`
  * times corpus-wide. Consecutive duplicated starts merge into
  * maximal spans (gaps-and-islands), and span intervals closer than
  * `gram` tokens merge again into coverage intervals, so the
  * reported duplicated-token count is the exact size of the UNION of
  * all duplicated windows — no double counting.
  *
  * Scale shape: grams are 8-byte xxhash64 keys of token windows (no
  * per-gram strings cross a shuffle); the occurrence count is one
  * hash aggregation with map-side combine; flagging positions is one
  * shuffle join on the gram key; span assembly is two windows
  * partitioned BY DOCUMENT (state bounded by the longest document,
  * not the corpus). Nothing driver-side grows with the data.
  */
object SubstringDedup {

  /** (doc_id, pos, gram-hash) for every `gram`-token window start.
    * Gram keys are xxhash64 of token-hash tuples, the same 8-byte
    * construction as [[Dedup.shingleIndex]] (no per-gram string
    * building). Plan-shape rules (measured, 50×): the token-hash
    * array is its own projection and the guarded gram transform sits
    * DIRECTLY inside `posexplode` in the very next select — an
    * intermediate alias projection for the gram array gets collapsed
    * into the Generate's child, inlining `transform(split(...))`
    * into every `element_at` access of the lambda (no CSE for HOF
    * lambdas → O(tokens²) per doc: 15 s vs 0.3 s on sf0.1). The
    * `when` guard matters too: sequence(0, negative) would DESCEND
    * (Spark infers step −1), not produce an empty array. */
  private def gramPositions(df: DataFrame, idCol: String,
      textCol: String, gram: Int): DataFrame = {
    val hw = col("hw")
    val grams = transform(sequence(lit(0), size(hw) - gram), i =>
      xxhash64((0 until gram).map(k => element_at(hw, i + k + 1)): _*))
    df.select(col(idCol).as("doc_id"),
        transform(TextStats.tokens(col(textCol)), t => xxhash64(t))
          .as("hw"))
      .select(col("doc_id"), posexplode(
        when(size(hw) >= gram, grams)
          .otherwise(array().cast("array<bigint>"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("g"))
  }

  /** Per-document duplicated-span report over documents having at
    * least one duplicated window: (doc_id, n_dup_spans,
    * n_dup_tokens, n_tokens, dup_frac), ordered by doc_id.
    * `n_dup_tokens` counts tokens covered by ≥1 duplicated window
    * (union semantics); spans are maximal merged coverage intervals. */
  def duplicatedSpanStats(df: DataFrame, idCol: String, textCol: String,
      gram: Int = 5, minOcc: Long = 2L): DataFrame = {
    val pos = gramPositions(df, idCol, textCol, gram)
    // corpus-wide window occurrence counts; keep only duplicated grams
    val dupG = pos.groupBy("g").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minOcc)
      .select("g")
    val dupPos = pos.join(dupG, Seq("g")).select("doc_id", "pos")
    // pass 1 (gaps & islands): consecutive duplicated starts → runs;
    // a run [a, b] covers tokens [a, b + gram - 1]
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runs = dupPos
      .withColumn("isl", col("pos") - row_number().over(wDoc))
      .groupBy("doc_id", "isl")
      .agg(min("pos").as("s"), (max("pos") + lit(gram - 1)).as("e"))
    // pass 2: runs whose covered intervals touch/overlap (gap < gram)
    // merge into coverage intervals — strictly interval union
    val wRun = Window.partitionBy("doc_id").orderBy("s")
    val grouped = runs
      .withColumn("pme",
        max(col("e")).over(wRun.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_grp",
        when(col("pme").isNull || col("s") > col("pme") + 1, 1L)
          .otherwise(0L))
      .withColumn("grp", sum("new_grp")
        .over(wRun.rowsBetween(Window.unboundedPreceding, 0)))
    val cover = grouped.groupBy("doc_id", "grp")
      .agg(min("s").as("cs"), max("e").as("ce"))
    val perDoc = cover.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("ce") - col("cs") + 1).as("n_dup_tokens"))
    val sizes = df.select(col(idCol).as("doc_id"),
      size(TextStats.tokens(col(textCol))).cast("long").as("n_tokens"))
    perDoc.join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_dup_spans"), col("n_dup_tokens"),
        col("n_tokens"),
        sig5(col("n_dup_tokens").cast("double") / col("n_tokens"))
          .as("dup_frac"))
      .orderBy("doc_id")
  }
}
