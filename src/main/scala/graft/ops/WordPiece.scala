package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece tokenizer training (Schuster & Nakajima, ICASSP 2012;
  * the BERT tokenizer) — the third public subword family beside BPE
  * ([[BpeTrain]], frequency-scored merges) and the unigram LM
  * ([[UnigramLm]], likelihood-pruned vocabulary): WordPiece merges
  * like BPE but scores candidate pairs by the LIKELIHOOD gain of the
  * merge under a unigram model,
  *
  *   score(a, b) = count(ab) / (count(a) · count(b)),
  *
  * so a pair wins for being surprising together, not merely frequent
  * — common function-word chains (high count(a)·count(b)) lose to
  * cohesive stems. Symbols carry the `##` continuation convention:
  * a word's first character is a plain piece, every later character
  * a `##`-prefixed one, and merging (a, ##b) yields a##b-without-##
  * (i.e. `a + b`), keeping word-initial and mid-word pieces
  * distinct — the property the greedy encoder depends on.
  *
  * Distributed shape — the [[BpeTrain]] word-count factorization:
  * one corpus scan builds the word-frequency table, then every
  * iteration touches only O(vocab) rows: one adjacent-pair count,
  * one symbol-occurrence count (the score's denominator — the one
  * aggregation BPE does not need), one driver argmax, one map-only
  * literal rewrite.
  *
  * Determinism / oracle-replayability: the same MARK/SEP literal
  * symbol encoding as [[BpeTrain]] (markers make mid-token matches
  * impossible; greedy-left literal replace = the merge pass). The
  * score is one IEEE multiply + one divide of exact integer-valued
  * doubles — bit-identical cross-engine — and the argmax orders by
  * the sig5-ROUNDED score with (a, b) ascending tie-break, so the
  * chosen merge replays exactly in the DuckDB oracle's chained CTEs.
  */
object WordPiece {

  val Sep = "\u0001"
  val Mark = "\u0002"
  /** The continuation prefix (BERT convention). */
  val Cont = "##"

  /** (doc_id, word) occurrences under the shared trainable-word
    * filter (lowercase [a-z]+, length-capped like [[BpeTrain]]). */
  def docWords(df: DataFrame, idCol: String, textCol: String,
      maxWordLen: Int = 64): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(col("doc_id"), lower(col("tok")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$") &&
        length(col("word")) <= maxWordLen)

  /** Word-frequency table symbolized WordPiece-style: first char
    * plain, every later char ##-prefixed, each piece MARK-wrapped
    * and SEP-joined: (sym, freq). */
  def vocab(df: DataFrame, textCol: String, maxWordLen: Int = 64)
      : DataFrame = {
    val words = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .select(lower(col("tok")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$") &&
        length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    words.select(symbolize(col("word")).as("sym"), col("freq"))
  }

  private def symbolize(word: Column): Column =
    when(length(word) === 1, concat(lit(Mark), word, lit(Mark)))
      .otherwise(concat(
        lit(Mark), substring(word, 1, 1), lit(Mark), lit(Sep),
        rtrim(regexp_replace(expr("substring(word, 2)"), "(.)",
          Mark + Cont + "$1" + Mark + Sep), Sep)))

  private def strip(s: String): String = s.replace(Mark, "")
  private def stripCont(s: String): String =
    if (s.startsWith(Cont)) s.substring(Cont.length) else s

  /** Train `merges` likelihood-scored merge rules. Returns one row
    * per learned rule: (rnk, left_sym, right_sym, merged,
    * pair_count, score) — score is the sig5-rounded
    * cnt/(c_left·c_right) that won the rule its rank. */
  def train(df: DataFrame, textCol: String, merges: Int,
      maxWordLen: Int = 64): DataFrame = {
    val spark = df.sparkSession
    require(merges >= 1, "merges must be >= 1")
    var cur = Materialize.materialize(vocab(df, textCol, maxWordLen))
    val out = ArrayBuffer.empty[Row]
    var done = false
    for (rnk <- 1 to merges if !done) {
      val toks = split(col("sym"), Sep)
      // symbol-occurrence counts — the likelihood denominator
      val syms = cur
        .select(explode(toks).as("sym"), col("freq"))
        .groupBy("sym").agg(sum("freq").as("c"))
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
        .join(syms.select(col("sym").as("a"), col("c").as("ca")),
          Seq("a"))
        .join(syms.select(col("sym").as("b"), col("c").as("cb")),
          Seq("b"))
        .withColumn("score", graft.det.Sig.sig5(
          col("cnt").cast("double") /
            (col("ca").cast("double") * col("cb").cast("double"))))
        .orderBy(col("score").desc, col("a").asc, col("b").asc)
        .limit(1).select("a", "b", "cnt", "score").collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, cnt, score) =
          (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2), best(0).getDouble(3))
        val merged = strip(a) + stripCont(strip(b))
        out += Row(rnk.toLong, strip(a), strip(b), merged, cnt, score)
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
        StructField("pair_count", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))))
  }

  /** The deployable piece vocabulary: the training alphabet in both
    * word-initial and `##` continuation form, plus every merged
    * piece — O(alphabet + merges) driver state, the WordPiece
    * artifact a tokenizer ships. */
  def vocabPieces(df: DataFrame, textCol: String,
      rules: Seq[String], maxWordLen: Int = 64): Seq[String] = {
    val chars = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .select(lower(col("tok")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$") &&
        length(col("word")) <= maxWordLen)
      .select(explode(split(col("word"), "")).as("ch"))
      .where(length(col("ch")) === 1)
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    (chars ++ chars.map(Cont + _) ++ rules).distinct
  }

  /** Greedy longest-match-first encoding (the WordPiece/BERT
    * `tokenize`): per word, repeatedly take the LONGEST vocabulary
    * piece at the cursor (word-initial pieces at position 0,
    * `##` continuation pieces after), single-char fallback if
    * nothing matches. Emits per-doc (n_words, n_subwords).
    *
    * Scale shape: the greedy DP is an in-row fold over the DISTINCT
    * word frame (vocabulary rides as one array literal — map-only),
    * joined back to the (doc, word) stream — the corpus pays one
    * token-histogram-shaped shuffle and nothing else.
    *
    * Empty-vocabulary contract: with `pieces` empty the fold's
    * single-char sentinel fires on every character, so n_subwords
    * degrades to total chars per doc — a crash-avoidance fallback,
    * NOT the reference one-[UNK]-per-word convention, and the DuckDB
    * oracle has no matching branch. The declared oracle contract
    * therefore assumes a non-empty vocabulary (train rows > 0); the
    * sentinel path is out-of-contract by design. */
  def encodeTokenCount(df: DataFrame, idCol: String, textCol: String,
      pieces: Seq[String], maxWordLen: Int = 64): DataFrame = {
    // Empty vocabulary (a corpus whose every token failed the word
    // filter — the pre-r15 open-vocab regression) degrades to the
    // single-char sentinel per character, the [UNK]-style total
    // fallback, instead of crashing the whole job: the loud signal
    // is the TRAIN query's zero rows, not a mid-pipeline exception.
    val maxP =
      if (pieces.isEmpty) 1 else pieces.map(p => stripCont(p).length).max
    val dwords = docWords(df, idCol, textCol, maxWordLen)
    val uw = dwords.select("word").distinct()
    val vocabLit = typedLit(pieces)
    // fold over length(word) ticks; each tick either advances by the
    // longest matching piece or (already past the end) no-ops. The
    // appended sentinel 1 makes the fallback branch total — single
    // chars are in the vocabulary whenever the encode corpus stays
    // inside the training alphabet, so the sentinel only fires on
    // genuinely unseen characters. The vocabulary literal is bound
    // as a column (`__wp_vocab`) so the SQL fold can reference it.
    val foldSql = s"""aggregate(
      sequence(1, length(word)),
      named_struct('pos', 0, 'n', CAST(0 AS BIGINT)),
      (st, t) -> IF(st.pos >= length(word), st,
        named_struct(
          'pos', st.pos + element_at(array_append(filter(transform(
            sequence(least($maxP, length(word) - st.pos), 1, -1),
            L -> IF(array_contains(__wp_vocab,
              IF(st.pos = 0, substring(word, 1, L),
                 concat('$Cont', substring(word, st.pos + 1, L)))),
              L, -1)), x -> x > 0), CAST(1 AS INT)), 1),
          'n', st.n + CAST(1 AS BIGINT))),
      st -> st.n)"""
    val perWord = uw.withColumn("__wp_vocab", vocabLit)
      .withColumn("n_sub", expr(foldSql))
      .select("word", "n_sub")
    // NO broadcast hint: the distinct-word frame grows with Heaps'
    // law (10^8-10^9 words at 100 TB crawl scale), so a forced
    // broadcast dies at the 8 GB ceiling. AQE broadcasts it anyway
    // whenever it measures small; above the threshold the join
    // degrades gracefully to sort-merge on `word`.
    dwords.join(perWord, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sub").cast("long").as("n_subwords"))
      .orderBy("doc_id")
  }
}
