package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.det.Sig
import graft.ops.UnigramLm

/** Property check: the in-engine unigram hard-EM trainer (HOF-fold
  * Viterbi + relational M-step) must agree with a straightforward
  * driver-side reference implementation on random corpora — the
  * fold/backtrack machinery is an execution strategy, not a
  * semantics change. A two-letter alphabet maximizes score-tie
  * density, so the (score desc, start asc) tie-break is exercised
  * constantly. */
class UnigramPropertySpec extends SparkSpec {

  import spark.implicits._

  private val MaxP = UnigramLm.MaxPieceLen

  private def refSeed(words: Map[String, Long], minCount: Long)
      : Map[String, (Long, Double)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; s <- 0 until w.length;
         e <- (s + 1) to math.min(s + MaxP, w.length)) {
      val p = w.substring(s, e)
      counts.update(p, counts.getOrElse(p, 0L) + f)
    }
    val kept = counts.filter { case (p, c) =>
      c >= minCount || p.length == 1 }
    val tot = kept.values.sum.toDouble
    kept.map { case (p, c) =>
      p -> (c, Sig.sig5(math.log(c / tot))) }.toMap
  }

  private def refViterbi(word: String, logp: Map[String, Double])
      : List[String] = {
    val L = word.length
    val best = Array.fill(L + 1)(0.0)
    val prev = Array.fill(L + 1)(-1)
    for (j <- 1 to L) {
      // candidates (s, j); max by score, ties toward smaller s —
      // evaluate in ascending s and require a STRICT improvement
      var bs = Double.NegativeInfinity
      var bp = -1
      for (s <- math.max(0, j - MaxP) until j) {
        logp.get(word.substring(s, j)).foreach { lp =>
          val sc = best(s) + lp
          if (sc > bs) { bs = sc; bp = s }
        }
      }
      best(j) = bs; prev(j) = bp
    }
    var pos = L
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) {
      out.prepend(word.substring(prev(pos), pos))
      pos = prev(pos)
    }
    out.toList
  }

  private def refEm(words: Map[String, Long],
      vocab: Map[String, (Long, Double)])
      : Map[String, (Long, Double)] = {
    val lp = vocab.map { case (p, (_, l)) => p -> l }
    val used = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; p <- refViterbi(w, lp))
      used.update(p, used.getOrElse(p, 0L) + f)
    val singles = vocab.keys.filter(_.length == 1)
    val counts = (used.keys ++ singles).map { p =>
      val c = used.getOrElse(p, 0L)
      p -> (if (p.length == 1) math.max(c, 1L) else c)
    }.toMap
    val tot = counts.values.sum.toDouble
    counts.map { case (p, c) =>
      p -> (c, Sig.sig5(math.log(c / tot))) }.toMap
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(20), Seed(i.toLong)))

  private val corpusGen: Gen[Map[String, Long]] = for {
    n <- Gen.choose(1, 7)
    ws <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
      f <- Gen.choose(1L, 5L)
    } yield (cs.mkString, f))
  } yield ws.groupBy(_._1).map { case (w, fs) =>
    w -> fs.map(_._2).sum }

  test("engine hard-EM agrees with the driver reference on random " +
      "two-letter corpora (segmentations, counts and log-probs)") {
    for (corpus <- samples(corpusGen, 25)) {
      val words = corpus.toSeq.toDF("word", "cnt")
      val seedRef = refSeed(corpus, 2L)
      val seedEng = UnigramLm.seedVocab(words, 2L).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(seedEng == seedRef, s"seed mismatch on $corpus")
      // segmentations piece-for-piece, in order
      val segEng = UnigramLm.segment(words,
          UnigramLm.seedVocab(words, 2L)).collect()
        .map(r => (r.getString(0), r.getInt(2), r.getString(3)))
        .groupBy(_._1)
        .map { case (w, rs) =>
          w -> rs.sortBy(_._2).map(_._3).toList }
      val lp = seedRef.map { case (p, (_, l)) => p -> l }
      for ((w, _) <- corpus)
        assert(segEng(w) == refViterbi(w, lp),
          s"segmentation mismatch on '$w' in $corpus")
      // M-step vocabulary
      val emRef = refEm(corpus, seedRef)
      val emEng = UnigramLm.train(
          Seq((1L, corpus.flatMap { case (w, f) =>
            Seq.fill(f.toInt)(w) }.mkString(" "))).toDF(
            "doc_id", "text"),
          "doc_id", "text", minCount = 2L).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(emEng == emRef, s"EM mismatch on $corpus:\n" +
        s"  engine $emEng\n  ref    $emRef")
    }
  }
}
