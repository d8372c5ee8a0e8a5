package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.BpeTrain

/** Property check: the distributed BPE trainer must agree with a
  * straightforward driver-side reference implementation (plain
  * Scala lists, no string-encoding tricks) on random corpora — the
  * marker/separator literal-replace machinery is an optimization,
  * not a semantics change. */
class BpePropertySpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE: Sennrich counting (overlapping adjacent pairs,
    * word-frequency weighted), argmax by (count desc, pair asc on
    * the MARKER-WRAPPED byte order — the engine contract), greedy
    * left-to-right merge application. */
  private def referenceBpe(words: Map[String, Long], merges: Int)
      : Seq[(String, String, Long)] = {
    val M = BpeTrain.Mark
    def wrap(s: String) = M + s + M
    var vocab: Map[List[String], Long] =
      words.map { case (w, f) => w.toList.map(_.toString) -> f }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    for (_ <- 1 to merges if vocab.exists(_._1.size >= 2)) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((toks, f) <- vocab; i <- 0 until toks.size - 1) {
        val k = (toks(i), toks(i + 1))
        counts.update(k, counts.getOrElse(k, 0L) + f)
      }
      if (counts.isEmpty) return out.toSeq
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) =>
        (-c, wrap(x), wrap(y)) }
      out += ((a, b, cnt))
      val merged = a + b
      vocab = vocab.toSeq.map { case (toks, f) =>
        val nt = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < toks.size) {
          if (i + 1 < toks.size && toks(i) == a && toks(i + 1) == b) {
            nt += merged; i += 2
          } else { nt += toks(i); i += 1 }
        }
        nt.toList -> f
      }.groupBy(_._1).map { case (t, fs) => t -> fs.map(_._2).sum }
    }
    out.toSeq
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(25), Seed(i.toLong)))

  // small alphabet → heavy pair collisions and tie-breaks; repeated
  // chars → overlapping-pair and greedy-merge stress
  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      .suchThat(_.length <= 12)
  private val corpusGen: Gen[List[String]] =
    Gen.nonEmptyListOf(wordGen).suchThat(_.nonEmpty)

  test("distributed trainer equals the reference on 30 random " +
      "corpora (rules, order, and counts)") {
    samples(corpusGen, 30).zipWithIndex.foreach { case (ws, i) =>
      val docs = ws.grouped(5).map(_.mkString(" ")).toSeq
        .zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val got = BpeTrain.train(docs, "text", merges = 4)
        .collect().map(r =>
          (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      val freq = ws.groupBy(identity).map { case (w, g) =>
        w -> g.size.toLong }
      val want = referenceBpe(freq, 4)
      assert(got === want, s"corpus #$i: $ws")
    }
  }
}
