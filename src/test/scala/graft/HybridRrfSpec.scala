package graft

import graft.ops.Search

/** Reciprocal-rank fusion: docs retrieved by both legs must outrank
  * single-leg docs of comparable rank; one-sided docs still fuse. */
class HybridRrfSpec extends SparkSpec {

  import spark.implicits._

  test("hybridRrf: both-legs doc wins; single-leg docs carry a null " +
      "rank for the missing leg; scores are the exact 1/(60+r) sums") {
    // docs: term-heavy docs 10..14 (lexical hits), vectors near the
    // query vector for ids 20..24 (semantic hits), id 30 in BOTH
    val docs = ((10L to 14L).map(i =>
        (i, s"alpha alpha alpha pad$i")) ++
      (20L to 29L).map(i => (i, s"filler pad$i")) :+
      ((30L, "alpha alpha alpha alpha"))).toDF("doc_id", "text")
    // 4-dim embeddings: query id 0 at [1,0,0,0]; 20..24 and 30 close
    // to it; everything else orthogonal-ish
    def vec(id: Long): Seq[Float] = id match {
      case 0L => Seq(1f, 0f, 0f, 0f)
      case i if (i >= 20L && i <= 24L) =>
        Seq(1f, (i - 19L).toFloat * 0.1f, 0f, 0f)
      case 30L => Seq(1f, 0.05f, 0f, 0f)
      case i => Seq(0f, 1f, (i % 7).toFloat * 0.1f, 1f)
    }
    val emb = ((0L to 14L) ++ (20L to 30L)).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    // k=5 so neither leg swallows the whole 26-doc corpus — each
    // list must leave docs for the other to contribute alone
    val out = Search.hybridRrf(docs, emb, "doc_id", "text",
        "vec_id", "embedding", terms = Seq("alpha"), k = 5,
        topM = 10)
      .collect()
    val byDoc = out.map(r => r.getLong(1) ->
      ((r.getLong(0), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    // doc 30 is in both lists → two reciprocal terms → rank 1
    assert(out.head.getLong(1) === 30L, s"got ${out.head}")
    val (r30, s30, lex30, sem30) = byDoc(30L)
    assert(r30 === 1L && lex30.isDefined && sem30.isDefined)
    assert(s30 === 1.0 / (60.0 + lex30.get) + 1.0 / (60.0 + sem30.get))
    // a lexical-only doc: null sem_rnk, score exactly one term
    val lexOnly = byDoc.collect {
      case (d, (_, s, Some(lr), None)) => (d, s, lr) }
    assert(lexOnly.nonEmpty)
    lexOnly.foreach { case (_, s, lr) =>
      assert(s === 1.0 / (60.0 + lr)) }
    // a semantic-only doc: null lex_rnk
    assert(byDoc.exists { case (_, (_, _, None, Some(_))) => true
      case _ => false })
  }
}
