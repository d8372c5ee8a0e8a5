package graft

import org.apache.spark.sql.functions._
import graft.ops.UnigramLm

/** Unigram-LM tokenizer (round 12): seed statistics, the Viterbi
  * DP (scores, argmax, tie-break) and the hard-EM re-estimation all
  * match hand computation. */
class UnigramSpec extends SparkSpec {

  test("one hard-EM step matches the hand-computed vocabulary") {
    val s = spark
    import s.implicits._
    // corpus: abab x3, ab x2, b x1 (one doc per occurrence)
    val docs = Seq((1L, "abab ab abab"), (2L, "ab b abab"))
      .toDF("doc_id", "text")
    val words = UnigramLm.wordCounts(docs, "doc_id", "text")
    val wc = words.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc == Map("abab" -> 3L, "ab" -> 2L, "b" -> 1L))
    // seed counts: a 8, b 9, ab 8, ba 3, aba 3, bab 3, abab 3
    val seed = UnigramLm.seedVocab(words, minCount = 2L)
    val sc = seed.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sc == Map("a" -> 8L, "b" -> 9L, "ab" -> 8L, "ba" -> 3L,
      "aba" -> 3L, "bab" -> 3L, "abab" -> 3L))
    // Viterbi under the seed: whole-word pieces win everywhere
    val segs = UnigramLm.segment(words, seed).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3)))
    assert(segs.toSet == Set(("abab", 0, "abab"), ("ab", 0, "ab"),
      ("b", 0, "b")))
    // M-step: abab 3, ab 2, b 1, a floored to 1; total 7
    val v2 = UnigramLm.train(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(v2.keySet == Set("abab", "ab", "a", "b"))
    assert(v2("abab")._1 == 3L && v2("a")._1 == 1L)
    assert(math.abs(v2("abab")._2 - math.log(3.0 / 7.0)) < 1e-4)
    assert(math.abs(v2("a")._2 - math.log(1.0 / 7.0)) < 1e-4)
    // encode under the trained vocab: every word is one piece
    val enc = UnigramLm.encodeStats(docs, "doc_id", "text",
        UnigramLm.train(docs, "doc_id", "text", 2L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(enc(1L) == ((3L, 3L, 1.0)) && enc(2L) == ((3L, 3L, 1.0)))
  }

  test("worstServed ranks character-fallback words first and " +
      "computes per-word fertility") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab ab xy")).toDF("doc_id", "text")
    val vocab = Seq(("a", 1L, -1.0), ("b", 1L, -1.0),
        ("x", 1L, -2.0), ("y", 1L, -2.0), ("ab", 2L, -0.5))
      .toDF("piece", "cnt", "logp")
    val rows = UnigramLm.worstServed(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(4), r.getBoolean(5)))
    // xy: 2 pieces / 2 chars = 1.0 fallback; ab: 1/2 = 0.5
    assert(rows.toSeq == Seq(("xy", 1L, 2L, 1.0, true),
      ("ab", 2L, 1L, 0.5, false)), rows.toSeq)
  }

  test("viterbi breaks score ties toward the smaller piece start") {
    val s = spark
    import s.implicits._
    val words = Seq(("aaa", 1L)).toDF("word", "cnt")
    val vocab = Seq(("a", 1L, -0.5), ("aa", 1L, -1.0))
      .toDF("piece", "cnt", "logp")
    // j=2 ties ("a"+"a" vs "aa" at -1.0) -> prefer s=0 ("aa");
    // j=3 ties at -1.5 -> prefer s=1 -> segmentation ["a", "aa"]
    val segs = UnigramLm.segment(words, vocab).collect()
      .sortBy(_.getInt(2))
      .map(r => r.getString(3)).toSeq
    assert(segs == Seq("a", "aa"), s"got $segs")
  }

  test("a word with no multi-char pieces falls back to characters") {
    val s = spark
    import s.implicits._
    val words = Seq(("xyz", 2L)).toDF("word", "cnt")
    val vocab = Seq(("x", 1L, -1.0), ("y", 1L, -1.0),
      ("z", 1L, -1.0)).toDF("piece", "cnt", "logp")
    val segs = UnigramLm.segment(words, vocab).collect()
      .sortBy(_.getInt(2)).map(r => r.getString(3)).toSeq
    assert(segs == Seq("x", "y", "z"))
  }
}
