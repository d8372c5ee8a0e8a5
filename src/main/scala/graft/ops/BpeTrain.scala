package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge-rule TRAINING (Sennrich et al., ACL 2016 — "Neural
  * Machine Translation of Rare Words with Subword Units"), the
  * learn-the-tokenizer half that [[TextStats.bpePairs]]'s one-shot
  * pair count only previews: iteratively find the most frequent
  * adjacent symbol pair and fuse it into a new symbol, emitting the
  * learned merge table (the artifact a tokenizer ships).
  *
  * Distributed shape — the classic word-count factorization:
  *  - one corpus scan builds the WORD-FREQUENCY table (O(vocab)
  *    rows, not O(corpus)); every training iteration afterwards
  *    touches only the vocab — at 100 TB the corpus is read once.
  *  - each iteration: one small aggregation (adjacent-pair counts
  *    weighted by word freq, map-side combinable), one driver-side
  *    argmax (count DESC, pair ASC — total order, no RNG), one
  *    map-only literal-substring rewrite of the vocab.
  *
  * Determinism / oracle-replayability: words are symbolized as
  * `MARK tok MARK` markers joined by `SEP` separators (markers
  * U+0002, separator U+0001), so a merge of pair (a, b) is a
  * LITERAL `replace` of MARK-a-MARK-SEP-MARK-b-MARK — and literal
  * greedy-left non-overlapping replacement on this encoding is
  * exactly BPE's left-to-right merge pass (the marker chars make a
  * match mid-token impossible; the separator belongs to the matched
  * pair, so `a a a a` → `aa aa`, not `aa a a`). Both engines count
  * overlapping adjacent pairs (the Sennrich counting). All counts
  * are exact integers — no float anywhere.
  */
object BpeTrain {

  val Sep = "\u0001"
  val Mark = "\u0002"

  /** Word-frequency table of the [a-z]+ words (lowercased,
    * length-capped — the cap also bounds the oracle's unrolled
    * position join), symbolized for merge training: (sym, freq). */
  def vocab(df: DataFrame, textCol: String, maxWordLen: Int = 64)
      : DataFrame =
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .select(lower(col("tok")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$") &&
        length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(
        rtrim(regexp_replace(col("word"), "(.)",
          Mark + "$1" + Mark + Sep), Sep).as("sym"),
        col("freq"))

  private def strip(s: String): String = s.replace(Mark, "")

  /** Train `merges` merge rules. Returns one row per learned rule:
    * (rnk, left_sym, right_sym, merged, pair_count) — pair_count is
    * the corpus frequency that won the rule its rank. */
  def train(df: DataFrame, textCol: String, merges: Int,
      maxWordLen: Int = 64): DataFrame = {
    val spark = df.sparkSession
    require(merges >= 1, "merges must be >= 1")
    var cur = Materialize.materialize(vocab(df, textCol, maxWordLen))
    val out = ArrayBuffer.empty[Row]
    var done = false
    for (rnk <- 1 to merges if !done) {
      val toks = split(col("sym"), Sep)
      val pairs = cur
        .where(size(toks) >= 2)
        .select(explode(transform(
            sequence(lit(1), size(toks) - 1),
            i => struct(element_at(toks, i).as("a"),
              element_at(toks, i + 1).as("b")))).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
        val merged = strip(a) + strip(b)
        out += Row(rnk.toLong, strip(a), strip(b), merged, cnt)
        cur = Materialize.materialize(cur.select(
          replace(col("sym"), lit(a + Sep + b),
            lit(Mark + merged + Mark)).as("sym"),
          col("freq")))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("rnk", LongType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Encode text with a learned merge table — the apply side (what a
    * tokenizer does at corpus-processing time): symbolize, apply the
    * merges in rank order as literal rewrites, emit per-doc subword
    * token counts. Map-only: the merge table rides as literals. */
  def encodeTokenCount(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)], maxWordLen: Int = 64): DataFrame = {
    val word = lower(col("tok"))
    val sym0 = rtrim(regexp_replace(word, "(.)",
      Mark + "$1" + Mark + Sep), Sep)
    val symN = rules.foldLeft(sym0: Column) { case (s, (a, b)) =>
      replace(s,
        lit(Mark + a + Mark + Sep + Mark + b + Mark),
        lit(Mark + a + b + Mark))
    }
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .where(lower(col("tok")).rlike("^[a-z0-9]+$") &&
        length(col("tok")) <= maxWordLen)
      .select(col(idCol), (size(split(symN, Sep))).as("n_sub"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_sub").as("n_subwords"))
      .orderBy(idCol)
  }
}
