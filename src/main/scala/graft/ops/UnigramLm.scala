package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Unigram-LM tokenizer trained in-engine (Kudo 2018, the
  * SentencePiece unigram model), hard-EM variant: seed vocabulary =
  * all ≤[[MaxPieceLen]]-char substrings above a count floor (plus
  * every single character, so any word stays segmentable), E-step =
  * VITERBI best segmentation of each distinct word under the
  * current piece log-probs, M-step = piece counts from the chosen
  * segmentations (single characters floored at 1 so the vocabulary
  * never loses closure).
  *
  * Scale shape: everything runs on the DISTINCT-WORD frame weighted
  * by corpus counts — the BPE trainer's word-count factorization —
  * so corpus size only affects the ONE token-histogram shuffle;
  * the DP itself is an in-row fold over ≤[[MaxWordLen]] positions
  * with the piece candidates attached by ONE broadcast join of the
  * O(pieces) vocabulary. No driver-side state beyond nothing — the
  * whole E/M step is a static DAG.
  *
  * Determinism contract: piece log-probs are sig5-rounded; the DP
  * adds one rounded logp per step to a previously-identical prefix
  * score (single IEEE additions — bitwise identical cross-engine),
  * and ties break (score desc, start asc) on both engines, so the
  * chosen segmentation — not just its score — replays exactly. */
object UnigramLm {

  val MaxPieceLen = 4
  /** Words longer than this are excluded from training/encoding —
    * a documented contract (the fixture max is 8), kept in sync
    * with the oracle's DP unroll depth. */
  val MaxWordLen = 12

  /** (word, cnt) over the corpus — one token-histogram shuffle. */
  def wordCounts(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 1 &&
        length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** All (s, e) substring spans of `word` with e − s ≤ MaxPieceLen,
    * as an exploded (word, cnt, s, e, piece) frame. Multiplicity is
    * kept (a piece occurring twice in a word counts twice in the
    * seed, the standard seed statistic). */
  private def spans(words: DataFrame): DataFrame =
    words.select(col("word"), col("cnt"),
        explode(expr(s"""flatten(transform(
          sequence(0, length(word) - 1),
          s -> transform(
            sequence(s + 1, least(s + $MaxPieceLen, length(word))),
            e -> named_struct('s', s, 'e', e))))""")).as("se"))
      .select(col("word"), col("cnt"),
        col("se.s").as("s"), col("se.e").as("e"),
        expr("substring(word, se.s + 1, se.e - se.s)").as("piece"))

  /** Seed vocabulary: (piece, cnt, logp) with logp = sig5 ln share;
    * pieces below `minCount` are dropped unless single-char. */
  def seedVocab(words: DataFrame, minCount: Long = 2L): DataFrame = {
    val counts = spans(words).groupBy("piece")
      .agg(sum("cnt").as("cnt"))
      .where(col("cnt") >= minCount || length(col("piece")) === 1)
    val total = counts.agg(sum("cnt").cast("double").as("tot"))
    counts.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        sig5(log(col("cnt").cast("double") / col("tot"))).as("logp"))
  }

  /** Viterbi-best segmentation of each distinct word under `vocab`:
    * (word, cnt, piece, piece_idx). The DP is an in-row fold —
    * best(j) = max over candidate pieces (s, j) of best(s) + logp,
    * ties (score desc, s asc) — followed by an in-row backtrack. */
  def segment(words: DataFrame, vocab: DataFrame): DataFrame = {
    val cands = spans(words)
      .join(broadcast(vocab.select(col("piece"), col("logp"))),
        Seq("piece"), "left")
      .groupBy("word", "cnt")
      .agg(array_sort(collect_list(when(col("logp").isNotNull, expr(
        "named_struct('e', e, 's', s, 'lp', logp)")))).as("ps"))
    // acc(i+1) = named_struct(sc = best score to position i,
    //            pv = chosen piece start). When the vocabulary was
    // trained on the same corpus every single char is a piece and
    // filter() is never empty; with a PERSISTED vocab an unseen
    // character would make it empty, so the DP falls back to a
    // floored single-char OOV piece (logp = -100, far below any
    // real ln-share) instead of crashing under ANSI element_at.
    val best = expr(s"""aggregate(
      sequence(1, length(word)),
      array(named_struct('sc', 0.0D, 'pv', -1)),
      (acc, j) -> array_append(acc,
        if(size(filter(ps, p -> p.e = j)) = 0,
          named_struct(
            'sc', element_at(acc, j).sc + -100.0D,
            'pv', j - 1),
          named_struct(
            'sc', -element_at(array_sort(transform(
              filter(ps, p -> p.e = j),
              p -> named_struct(
                'nsc', -(element_at(acc, p.s + 1).sc + p.lp),
                'pv', p.s))), 1).nsc,
            'pv', element_at(array_sort(transform(
              filter(ps, p -> p.e = j),
              p -> named_struct(
                'nsc', -(element_at(acc, p.s + 1).sc + p.lp),
                'pv', p.s))), 1).pv))),
      acc -> acc)""")
    val parts = expr(s"""reverse(aggregate(
      sequence(1, length(word)),
      named_struct('pos', length(word),
        'acc', filter(array(named_struct('s', 0, 'e', 0)),
          x -> false)),
      (st, i) -> if(st.pos <= 0, st, named_struct(
        'pos', element_at(best, st.pos + 1).pv,
        'acc', array_append(st.acc, named_struct(
          's', element_at(best, st.pos + 1).pv, 'e', st.pos)))),
      st -> st.acc))""")
    cands
      .withColumn("best", best)
      .withColumn("parts", parts)
      .select(col("word"), col("cnt"),
        posexplode(expr(
          "transform(parts, q -> substring(word, q.s + 1, q.e - q.s))"))
          .as(Seq("piece_idx", "piece")))
  }

  /** M-step: piece counts from the segmentations, single characters
    * floored at 1 (closure), sig5 ln-share log-probs. */
  def reestimate(segments: DataFrame, vocab: DataFrame): DataFrame = {
    val used = segments.groupBy("piece").agg(sum("cnt").as("c"))
    val counts = vocab.where(length(col("piece")) === 1)
      .select(col("piece"))
      .join(used, Seq("piece"), "full")
      .select(col("piece"),
        when(length(col("piece")) === 1,
          greatest(coalesce(col("c"), lit(0L)), lit(1L)))
          .otherwise(col("c")).as("cnt"))
      .where(col("cnt").isNotNull)
    val total = counts.agg(sum("cnt").cast("double").as("tot"))
    counts.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        sig5(log(col("cnt").cast("double") / col("tot"))).as("logp"))
  }

  /** `iters` hard-EM steps from the seed: the trained vocabulary.
    * Each round's vocabulary is MATERIALIZED (the iterative-
    * algorithm lineage contract) — round k's DP otherwise replays
    * every earlier round's segmentation inside its own plan. */
  def train(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L, iters: Int = 1): DataFrame = {
    val words = Materialize.materialize(
      wordCounts(df, idCol, textCol))
    val seed = seedVocab(words, minCount)
    var vocab = seed
    for (_ <- 1 to iters)
      vocab = Materialize.materialize(
        reestimate(segment(words, vocab), seed))
    vocab
  }

  /** The words a trained vocabulary serves WORST: per distinct
    * multi-char word, pieces used, per-word fertility
    * (pieces/chars — 1.0 = pure character fallback, the tokenizer's
    * OOV diagnostic), ranked worst-first with (count desc, word
    * asc) ties. Runs on the distinct-word frame like everything
    * else here. */
  def worstServed(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, k: Int = 20): DataFrame = {
    val words = Materialize.materialize(
      wordCounts(df, idCol, textCol))
    segment(words, vocab)
      .groupBy("word", "cnt").agg(count(lit(1)).as("n_pieces"))
      .where(length(col("word")) > 1)
      .select(col("word"), col("cnt"), col("n_pieces"),
        length(col("word")).cast("long").as("word_len"),
        sig5(col("n_pieces").cast("double") / length(col("word")))
          .as("fertility"),
        (col("n_pieces") === length(col("word")))
          .as("char_fallback"))
      .orderBy(col("fertility").desc, col("cnt").desc,
        col("word").asc)
      .limit(k)
  }

  /** Per-document encoding stats under a trained vocabulary:
    * (doc_id, n_words, n_pieces, fertility). The per-word piece
    * count is computed once on the distinct-word frame and joined
    * back — the segmentation never touches corpus-sized data. */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val words = Materialize.materialize(
      wordCounts(df, idCol, textCol))
    val perWord = segment(words, vocab)
      .groupBy("word").agg(count(lit(1)).as("n_pieces"))
    df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 1 &&
        length(col("word")) <= MaxWordLen)
      // NO broadcast hint on the per-word frame: distinct words grow
      // with Heaps' law, so forcing a broadcast caps the operator at
      // Spark's 8 GB broadcast ceiling. AQE picks broadcast when the
      // measured size is small, sort-merge otherwise.
      .join(perWord, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").cast("long").as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        sig5(col("n_pieces").cast("double") / col("n_words"))
          .as("fertility"))
      .orderBy("doc_id")
  }
}
