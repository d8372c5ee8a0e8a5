package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Blocklist

/** Dev utility: blocklist matching at corpus scale — measures the
  * one-pass Aho–Corasick claim against the composed-builtins
  * alternative a naive pipeline writes (k per-term
  * `replace`/`length` scans, i.e. k full passes over every document's
  * bytes). Both forms compute the same per-term occurrence totals
  * (terms are filtered to BORDERLESS words, where the non-overlapping
  * replace count equals AC's all-occurrences count), so the smoke
  * also value-asserts equality before timing.
  *
  * Corpus: `docs` documents of 40 Zipf-ish synthetic words (the
  * [[BpeScaleSmoke]] generator), terms = `k` words spread across the
  * frequency spectrum.
  *
  * Usage: `graft.BlocklistScaleSmoke [docs] [k]` (-Xmx32g). */
object BlocklistScaleSmoke {
  def main(args: Array[String]): Unit = {
    val docs = if (args.length > 0) args(0).toLong else 10000000L
    val k = if (args.length > 1) args(1).toInt else 64
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
      println(f"[bl-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val path = "/tmp/graft_bl_smoke"
    timed(s"generate + write $docs docs x 40 words") {
      val letters = typedLit(('a' to 'z').map(_.toString))
      def letter(idx: org.apache.spark.sql.Column) =
        element_at(letters, (idx + 1).cast("int"))
      val w = (1 to 40).map { i =>
        val h = pmod(col("id") * lit(2654435761L) + lit(i * 40503L),
          lit(1048576L)).cast("double") / lit(1048576.0)
        val wid = (h * h * lit(50000.0)).cast("long")
        concat(letter(pmod(wid, lit(26L))),
          letter(pmod(wid / 26L, lit(26L))),
          letter(pmod(wid / 676L, lit(26L))),
          when(wid >= 17576L, letter(pmod(wid / 17576L, lit(26L))))
            .otherwise(lit("")),
          when(wid >= 456976L, lit("x")).otherwise(lit("")))
      }
      spark.range(docs)
        .select(col("id").as("doc_id"), concat_ws(" ", w: _*).as("text"))
        .write.mode("overwrite").parquet(path)
    }
    val corpus = spark.read.parquet(path)

    def borderless(s: String): Boolean =
      (1 until s.length).forall(j => s.take(j) != s.takeRight(j))

    val terms = timed(s"pick $k borderless terms across the spectrum") {
      val byFreq = corpus.limit(200000)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").count().orderBy(desc("count"))
        .limit(5000).collect().map(_.getString(0))
      byFreq.filter(borderless).zipWithIndex
        .collect { case (w, i) if i % (4500 / k) == 0 => w }
        .take(k).toSeq
    }
    println(s"[bl-smoke] terms=${terms.size} sample=${terms.take(5)}")

    val acStats = timed(s"AC one-pass termStats (${terms.size} terms)") {
      Blocklist.termStats(corpus, "text", terms)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val composed = timed(s"composed replace-scan x${terms.size}") {
      val aggs = terms.zipWithIndex.map { case (tm, i) =>
        sum(((length(col("text")) -
          length(replace(col("text"), lit(tm), lit("")))) /
          tm.length).cast("long")).as(s"t_$i")
      }
      val row = corpus.agg(aggs.head, aggs.tail: _*).collect().head
      terms.zipWithIndex.map { case (tm, i) => tm -> row.getLong(i) }
        .toMap
    }
    require(acStats == composed,
      s"value mismatch: ${acStats.toSeq.diff(composed.toSeq).take(3)}")
    println(s"[bl-smoke] values equal across ${terms.size} terms; " +
      s"total hits=${acStats.values.sum}")

    val gateN = timed(s"AC filterDocs early-exit gate (${terms.size} terms)") {
      Blocklist.filterDocs(corpus, "text", terms).count()
    }
    val gateC = timed(s"composed instr-gate x${terms.size}") {
      corpus.where(terms.map(tm => instr(col("text"), tm) === 0)
        .reduce(_ && _)).count()
    }
    require(gateN == gateC, s"gate mismatch: $gateN != $gateC")
    println(s"[bl-smoke] gate kept $gateN / $docs (both forms agree)")
    spark.stop()
  }
}
