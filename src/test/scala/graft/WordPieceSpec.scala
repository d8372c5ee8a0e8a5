package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.det.Sig
import graft.ops.WordPiece

/** WordPiece (round 13): hand-computed micro-corpus pin plus the
  * ScalaCheck driver-reference agreement sweep (the
  * UnigramPropertySpec pattern) for the likelihood-scored merge
  * trainer and the greedy longest-match encoder. Two-letter alphabet
  * corpora maximize score-tie density, exercising the (score desc,
  * a, b asc) argmax tie-break constantly. */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  // ---- driver reference ----
  private def symbolize(w: String): Vector[String] =
    Vector(w.substring(0, 1)) ++ w.drop(1).map("##" + _)

  private def refTrain(words: Map[String, Long], merges: Int)
      : Seq[(Int, String, String, String, Long, Double)] = {
    var voc: Map[Vector[String], Long] =
      words.map { case (w, f) => symbolize(w) -> f }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long, Double)]
    for (k <- 1 to merges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      for ((syms, f) <- voc) {
        syms.foreach(s => sc.update(s, sc.getOrElse(s, 0L) + f))
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val key = (p(0), p(1))
          pc.update(key, pc.getOrElse(key, 0L) + f)
        }
      }
      if (pc.nonEmpty) {
        val scored = pc.toSeq.map { case ((a, b), cnt) =>
          (a, b, cnt,
            Sig.sig5(cnt.toDouble / (sc(a).toDouble * sc(b).toDouble)))
        }
        val (a, b, cnt, score) = scored.minBy { case (a, b, _, s) =>
          (-s, a, b) }
        val merged = a + b.stripPrefix("##")
        out += ((k, a, b, merged, cnt, score))
        voc = voc.toSeq.map { case (syms, f) =>
          val nb = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              nb += merged; i += 2
            } else { nb += syms(i); i += 1 }
          }
          nb.toVector -> f
        }.groupBy(_._1).map { case (s2, fs) =>
          s2 -> fs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  private def refGreedy(w: String, pieces: Set[String]): Long = {
    val maxP = pieces.map(_.stripPrefix("##").length).max
    var pos = 0; var n = 0L
    while (pos < w.length) {
      var l = math.min(maxP, w.length - pos)
      while (l >= 1 && {
        val cand = if (pos == 0) w.substring(0, l)
          else "##" + w.substring(pos, pos + l)
        !pieces.contains(cand)
      }) l -= 1
      if (l < 1) l = 1
      pos += l; n += 1
    }
    n
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

  test("likelihood scoring beats raw frequency where they disagree " +
      "(hand-computed micro-corpus)") {
    // corpus: "the the the them extra": pair (t,##h) count 4 is the
    // most FREQUENT, but its symbols are ubiquitous; (e,##x) etc.
    // counts 1. score(t,##h) = 4/(4*4) = 0.25 vs score(x,##t)...
    // use the reference to assert the engine, and assert the chosen
    // pair differs from the BPE (max-count) choice
    val docs = Seq((1L, "aab aab aab ab zq"))
      .toDF("doc_id", "text")
    val rules = WordPiece.train(docs, "text", merges = 1).collect()
    assert(rules.length == 1)
    val r = rules.head
    // counts: (a,##a)=3, (##a,##b)=3, (a,##b)=1, (z,##q)=1
    // symbols: a=4+3=... a appears word-initial in aab(3)+ab(1)=4;
    // ##a 3; ##b 4; z 1; ##q 1
    // scores: (a,##a)=3/(4*3)=0.25, (##a,##b)=3/(3*4)=0.25,
    //         (a,##b)=1/(4*4)=0.0625, (z,##q)=1/(1*1)=1.0 <- winner
    // BPE (max count) would pick (a,##a); WordPiece picks the
    // cohesive rare pair (z,##q)
    assert((r.getString(1), r.getString(2)) == (("z", "##q")))
    assert(r.getString(3) == "zq")
    assert(r.getLong(4) == 1L)
    assert(r.getDouble(5) == 1.0)
  }

  test("engine trainer + greedy encoder agree with the driver " +
      "reference on random two-letter corpora") {
    for (corpus <- samples(corpusGen, 25)) {
      val text = corpus.flatMap { case (w, f) =>
        Seq.fill(f.toInt)(w) }.mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val merges = 3
      val ref = refTrain(corpus, merges)
      val eng = WordPiece.train(docs, "text", merges).collect()
        .sortBy(_.getLong(0))
        .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4), r.getDouble(5)))
      assert(eng.toSeq == ref, s"train mismatch on $corpus:\n" +
        s"  engine ${eng.toSeq}\n  ref    $ref")
      // greedy encode: engine per-doc subword count vs reference
      val rules = ref.map(_._4)
      val pieces = WordPiece.vocabPieces(docs, "text", rules)
      val alphabet = corpus.keys.flatMap(_.toSeq).map(_.toString).toSet
      assert(pieces.toSet ==
        (alphabet ++ alphabet.map("##" + _) ++ rules))
      val enc = WordPiece.encodeTokenCount(docs, "doc_id", "text",
        pieces).collect()
      assert(enc.length == 1)
      val expWords = corpus.values.sum
      val expSub = corpus.map { case (w, f) =>
        f * refGreedy(w, pieces.toSet) }.sum
      assert(enc.head.getLong(1) == expWords)
      assert(enc.head.getLong(2) == expSub,
        s"encode mismatch on $corpus")
    }
  }

  test("open-vocabulary alphanumeric tokens train a real vocabulary " +
      "(r15: the heaps-tier corpus no longer yields zero pieces)") {
    // the GenSf heaps regime: every token is w<digits> — the pre-r15
    // [a-z]+ word filter rejected ALL of them, training an empty
    // vocab (BPE too) and crashing the encoder
    val docs = Seq((1L, "w17 w17 w17 w4213 w4213 w99"))
      .toDF("doc_id", "text")
    val rules = WordPiece.train(docs, "text", merges = 2).collect()
    assert(rules.length == 2, "digits must survive the word filter")
    val pieces = WordPiece.vocabPieces(docs, "text",
      rules.map(_.getString(3)).toSeq)
    assert(pieces.exists(_.matches("[0-9#]+.*")))
    val enc = WordPiece.encodeTokenCount(docs, "doc_id", "text",
      pieces).collect()
    assert(enc.length == 1 && enc.head.getLong(1) == 6L)
    assert(enc.head.getLong(2) < 6L * 5L) // merged pieces compress
  }

  test("empty piece vocabulary degrades to the single-char sentinel " +
      "per character, never throws (r15 total-encode contract)") {
    val docs = Seq((1L, "abc de"), (2L, "x"))
      .toDF("doc_id", "text")
    val enc = WordPiece.encodeTokenCount(docs, "doc_id", "text",
      Seq.empty).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // nothing matches, so the sentinel advances one char per tick:
    // n_subwords = total chars per doc
    assert(enc(1L) == ((2L, 5L)))
    assert(enc(2L) == ((1L, 1L)))
  }
}
