package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for the r16 un-broadcast of the tokenizer encode
  * joins (VERDICT r15 task 1): the per-word frame in
  * [[graft.ops.WordPiece.encodeTokenCount]] grows with Heaps' law,
  * so at crawl scale (10⁸–10⁹ distinct words) the former forced
  * `broadcast()` hint would materialize a multi-GB frame on the
  * driver and die at Spark's 8 GB broadcast ceiling. This main
  * builds a corpus with ≥50M DISTINCT words (two fresh words per
  * doc plus one shared stopword — the Heaps shape taken to its
  * worst case), runs the encode end-to-end, and asserts that
  *   (a) the executed (AQE-final) plan joined the per-word frame
  *       with a SortMergeJoin, not a broadcast, and
  *   (b) the subword totals match the independent closed form
  *       (single-char vocabulary ⇒ n_subwords = word chars).
  *
  * Usage: graft.EncodeScaleSmoke [nDocs]   (default 32M docs →
  * ~52M distinct words; ~96M (doc, word) rows through the join).
  * Recommended -Xmx48g on 32 threads (the 2–4 GB/core rule). */
object EncodeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 32000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "96")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // doc i = "w<i> x<knuth-hash i> the": w-words all distinct,
    // x-words ~63% distinct, one shared stopword — ~1.63·nDocs
    // distinct words, 3·nDocs (doc, word) rows
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat(lit("w"), col("id"), lit(" x"),
        pmod(col("id") * 2654435761L, lit(nDocs * 2)),
        lit(" the")).as("text"))

    val chars = "wxthe0123456789".map(_.toString)
    val pieces = chars ++ chars.map("##" + _)

    val t0 = System.nanoTime()
    val out = graft.ops.WordPiece.encodeTokenCount(
      docs, "doc_id", "text", pieces)
    val res = out.agg(count(lit(1)).as("n_docs"),
      sum("n_words").as("tot_words"),
      sum("n_subwords").as("tot_subwords"))
    val r = res.collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9

    // independent closed form: single-char-only vocabulary means the
    // greedy fold emits exactly length(word) subwords per word
    val expectChars = docs
      .agg(sum(length(regexp_replace(col("text"), " ", ""))))
      .collect()(0).getLong(0)
    val nDistinct = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct("w")).collect()(0).getLong(0)

    val plan = res.queryExecution.executedPlan.toString
    val smj = plan.contains("SortMergeJoin")
    val bhjOnWord = plan.contains("BroadcastHashJoin [word")

    println(s"[encode-smoke] docs=${r.getLong(0)} " +
      s"words=${r.getLong(1)} subwords=${r.getLong(2)} " +
      s"distinct_words=$nDistinct wall=${f"$secs%.1f"}s")
    println(s"[encode-smoke] expected subwords=$expectChars " +
      s"match=${r.getLong(2) == expectChars}")
    println(s"[encode-smoke] plan: sortMergeJoin=$smj " +
      s"broadcastOnWord=$bhjOnWord")
    require(r.getLong(0) == nDocs, "doc count mismatch")
    require(r.getLong(2) == expectChars, "subword closed form mismatch")
    require(nDistinct >= 50000000L || nDocs < 32000000L,
      s"fixture under-delivered distinct words: $nDistinct")
    require(smj && !bhjOnWord,
      "per-word join was not sort-merge — the broadcast ceiling is back")
    spark.stop()
  }
}
