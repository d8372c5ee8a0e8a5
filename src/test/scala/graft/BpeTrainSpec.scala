package graft

import graft.ops.BpeTrain

/** BPE merge training: hand-computable merges on a planted corpus,
  * the greedy-left overlap contract, and the encode side. */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  test("train learns the planted most-frequent pairs in order, " +
      "with exact counts") {
    // "ab" appears in every word of the dominant doc set; after
    // (a,b)→ab, the pair (ab, c) dominates
    val docs = Seq(
      (1L, "abc abc abc abc abd"),
      (2L, "abc abd xy"),
      (3L, "zq zq zq")).toDF("doc_id", "text")
    val rules = BpeTrain.train(docs, "text", merges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4)))
    // vocab: abc freq 5? no — distinct words counted by occurrence:
    // abc×5, abd×2, xy×1, zq×3. Pair (a,b): 5+2=7 (once per word
    // occurrence); merge 1 = (a,b)
    assert(rules(0) === ((1L, "a", "b", "ab", 7L)))
    // after merge 1: abc → [ab, c] (5), abd → [ab, d] (2);
    // pairs: (ab,c)=5, (ab,d)=2, (x,y)=1, (z,q)=3 → merge 2 = (ab,c)
    assert(rules(1) === ((2L, "ab", "c", "abc", 5L)))
    assert(rules(2) === ((3L, "z", "q", "zq", 3L)))
  }

  test("greedy-left non-overlapping merge: aaaa becomes [aa, aa], " +
      "aaa becomes [aa, a]") {
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    // merge 1 must be (a,a): overlap counting gives 3+2=5
    val rules = BpeTrain.train(docs, "text", merges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4)))
    assert(rules(0) === ((1L, "a", "a", "aa", 5L)))
    // after merge 1: aaaa → [aa, aa], aaa → [aa, a];
    // pairs: (aa,aa)=1, (aa,a)=1 -> tie on count; the b tie-break
    // compares marker-wrapped symbols in binary order, where the
    // closing MARK (0x02) sorts below a letter, so MARK-a-MARK <
    // MARK-aa-MARK and (aa, a) wins
    assert(rules(1) === ((2L, "aa", "a", "aaa", 1L)))
  }

  test("stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val rules = BpeTrain.train(docs, "text", merges = 5).collect()
    assert(rules.isEmpty, "single-char words have no pairs")
  }

  test("encodeTokenCount: applying learned rules reduces subword " +
      "counts, and full-word rules collapse words to one token") {
    val docs = Seq((1L, "abc abc abd"), (2L, "abc xy")).toDF(
      "doc_id", "text")
    val none = BpeTrain.encodeTokenCount(docs, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(none(1L) === 9L, "no rules → chars: 3+3+3")
    assert(none(2L) === 5L)
    val rules = Seq(("a", "b"), ("ab", "c"))
    val enc = BpeTrain.encodeTokenCount(docs, "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // abc → [abc] (1), abd → [ab, d] (2); xy → [x, y] (2)
    assert(enc(1L) === 1L + 1L + 2L)
    assert(enc(2L) === 1L + 2L)
  }
}
