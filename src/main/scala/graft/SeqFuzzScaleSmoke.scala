package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.EventOps

/** Dev utility: scale measurements for the round-10 sequence and
  * fuzzy-dedup additions.
  *
  * `markov` phase — [[graft.ops.EventOps.transitionMatrix]] and
  * [[graft.ops.EventOps.sequenceAnomaly]] over `rows` generated
  * events (default 100M across 2M users, 8 event types): the cost is
  * ONE user_id window shuffle (plus a second for the anomaly's
  * scoring join input); the matrix aggregate itself is |types|² and
  * free at any corpus size.
  *
  * `fuzzy` phase — the Levenshtein VERIFY stage of
  * [[graft.ops.Dedup.fuzzyPairs]] in isolation: `pairs` candidate
  * pairs (default 100k) of ~330-char near-identical texts. The DP is
  * O(L²) per pair (~10⁵ cells here), so verify cost is
  * pairs × L² — the measurement that justifies the LOW-threshold
  * Jaccard blocker: candidates, not corpus size, drive the bill.
  *
  * `drift` phase — [[graft.ops.Drift.ksDriftByGroup]] +
  * `numericDriftByGroup` at `rows` rows across 1000 groups: the
  * claim under test is that per-group monitoring costs ONE bounds
  * premise + ONE (group, bin) aggregation regardless of group count
  * (windows only touch the groups×bins aggregate).
  *
  * `phash` phase — [[graft.ops.Multimodal.imagePhash]] over `pairs`
  * real deflated/filtered PNG rasters: the codec mapPartitions
  * boundary measured (inflate + unfilter + resize + hash per image).
  *
  * Usage: `graft.SeqFuzzScaleSmoke [rows] [pairs] [phases]`
  * (phases CSV from `markov,fuzzy,drift,phash`). The
  * incremental-semantic-dedup probe join is NOT re-measured here:
  * its plan is the ivfTopK probe shape already measured at 2M
  * vectors (BASELINE.md round-9). */
object SeqFuzzScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000000L
    val pairs = if (args.length > 1) args(1).toLong else 100000L
    val phases = (if (args.length > 2) args(2) else "markov,fuzzy")
      .split(",").toSet
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
      println(f"[seqfuzz-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    if (phases("markov")) {
      val users = math.max(1L, rows / 50L) // ~50 events per user
      val ev = spark.range(rows).select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id")), lit(users)).as("user_id"),
        // LongType ns timestamps (the parquet-nanos path); scramble
        // so per-user sequences are not physically clustered
        (pmod(xxhash64(col("id"), lit(1)), lit(rows)) * 1000000L)
          .as("ts"),
        concat(lit("t"), pmod(xxhash64(col("id"), lit(2)), lit(8L)))
          .as("event_type"))
        .transform(graft.ops.Materialize.materialize)
      val m = timed(s"transitionMatrix over $rows events / $users users") {
        EventOps.transitionMatrix(ev).count()
      }
      println(s"[seqfuzz-smoke]   matrix rows = $m")
      val a = timed(s"sequenceAnomaly same corpus") {
        EventOps.sequenceAnomaly(ev).count()
      }
      println(s"[seqfuzz-smoke]   scored users = $a")
    }

    if (phases("fuzzy")) {
      val cand = spark.range(pairs).select(
        repeat(concat(lit("word"), pmod(col("id"), lit(1000L)),
          lit(" quick brown fox jumps over ")), 10).as("ta"))
        .select(col("ta"),
          concat(substring(col("ta"), 1, 150), lit("X"),
            substring(col("ta"), 152, 100000)).as("tb"))
        .transform(graft.ops.Materialize.materialize)
      val d = timed(s"levenshtein verify on $pairs ~330-char pairs") {
        cand.select(sum(levenshtein(col("ta"), col("tb"))))
          .first().getLong(0)
      }
      println(s"[seqfuzz-smoke]   total distance = $d (expect = pairs)")
      // banded DP with the fuzzyPairs cap (0.05 × 330 ≈ 17): O(L·cap)
      // per pair instead of O(L²) — the production verify form
      val dCap = timed(s"levenshtein banded verify (cap=17) same pairs") {
        cand.select(sum(greatest(
            levenshtein(col("ta"), col("tb"), 17), lit(0))))
          .first().getLong(0)
      }
      println(s"[seqfuzz-smoke]   banded total = $dCap (expect = pairs)")
    }

    if (phases("drift")) {
      val df = spark.range(rows).select(
        concat(lit("src"), pmod(xxhash64(col("id")), lit(1000L)))
          .as("src"),
        pmod(col("id"), lit(2L)).as("slice"),
        (pmod(xxhash64(col("id"), lit(3)), lit(10000L))
          + when(pmod(xxhash64(col("id")), lit(1000L)) === 7L &&
              col("id") % 2 === 1L, 5000L).otherwise(0L))
          .cast("double").as("v"))
        .transform(graft.ops.Materialize.materialize)
      val ks = timed(s"ksDriftByGroup over $rows rows / 1000 groups") {
        graft.ops.Drift.ksDriftByGroup(df, "src", col("v"),
          col("slice")).count()
      }
      val psi = timed(s"numericDriftByGroup same corpus") {
        graft.ops.Drift.numericDriftByGroup(df, "src", col("v"),
          col("slice")).count()
      }
      println(s"[seqfuzz-smoke]   groups: ks=$ks psi=$psi")
    }

    if (phases("phash")) {
      val imgs = graft.ops.Multimodal.synthRasterMedia(
        spark.range(pairs).select(col("id").as("doc_id")), "doc_id")
        .transform(graft.ops.Materialize.materialize)
      val n = timed(s"imagePhash over $pairs real 16x12 PNGs") {
        graft.ops.Multimodal.imagePhash(imgs, "doc_id", "payload")
          .count()
      }
      println(s"[seqfuzz-smoke]   hashed images = $n")
    }

    // `blocked` — global vs LANGUAGE-blocked near-dup candidate
    // generation at `rows` docs: same fixture (per-lang content
    // windows force within-lang near-dups; shared boilerplate gram
    // appears in EVERY lang), so the blocked index must suppress the
    // cross-lang candidates the global one pays for.
    if (phases("blocked")) {
      val langs = 5L
      val docs = spark.range(rows).select(
        col("id").as("doc_id"),
        concat(lit("l"), pmod(col("id"), lit(langs))).as("lang"),
        // ~50-token docs; near-dup neighbors share a content window
        // WITHIN a lang; +boilerplate trigram shared across langs
        concat_ws(" ",
          (0 until 40).map(j =>
            concat(lit(s"w${j}_"), pmod(col("id"), lit(langs)),
              // integer div (Column./ is DOUBLE division — the
              // BASELINE r10 content-id lesson)
              lit("_"), expr(s"id div ${langs * 3L}"))) ++
            // sub-cap CROSS-LANG template grams (df ≈ 100 ≪ cap):
            // candidate-pair fuel the global index pays for and the
            // blocked index prunes — they never pass the Jaccard
            // threshold, so they are pure candidate overhead
            (0 until 5).map(j =>
              concat(lit(s"tpl${j}_"), expr("id div 100"))): _*)
          .as("text"))
        .transform(graft.ops.Materialize.materialize)
      val g = timed(s"GLOBAL ngram pairs over $rows docs") {
        graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.5, maxDf = Some(1000L)).count()
      }
      println(s"[seqfuzz-smoke]   global pairs = $g")
      val b = timed(s"LANG-blocked ngram pairs over $rows docs") {
        graft.ops.Dedup.ngramJaccardPairsBlocked(docs, "doc_id",
          "text", "lang", n = 3, minJaccard = 0.5,
          maxDf = Some(1000L)).count()
      }
      println(s"[seqfuzz-smoke]   blocked pairs = $b")
    }

    // `datasheet` — the one-call corpus datasheet end-to-end at
    // `rows` docs (5 sections: manifest, domains, per-lang quality,
    // exact dedup, PII regex sweep). The PII regex projection is the
    // expected dominant term (3 regexes × corpus); everything else
    // is one hash aggregation per section.
    if (phases("datasheet")) {
      val docs = spark.range(rows).select(
        col("id").as("doc_id"),
        concat(lit("s"), pmod(col("id"), lit(20L))).as("source"),
        concat(lit("l"), pmod(col("id"), lit(7L))).as("lang"),
        concat_ws(" ", (0 until 30).map(j =>
          concat(lit(s"tok${j}_"), pmod(col("id"), lit(5000L)))): _*)
          .as("text"))
        .transform(graft.ops.Materialize.materialize)
      val d = graft.ops.UrlOps.synthUrl(
        graft.ops.Pii.synthPii(docs, "doc_id", "text"), "doc_id")
      val n = timed(s"corpusDatasheet over $rows docs (5 sections)") {
        graft.ops.Datasheet
          .corpusDatasheet(d, urlCol = Some("url")).count()
      }
      println(s"[seqfuzz-smoke]   datasheet rows = $n")
    }

    // `audiofp` — the audio twin of `phash`: fingerprint `pairs`
    // real 16-bit PCM WAVs (~280 samples each). Cost shape is the
    // same codec mapPartitions boundary + an 8-byte groupBy.
    if (phases("audiofp")) {
      val clips = graft.ops.Multimodal.synthAudio(
        spark.range(pairs).select(col("id").as("doc_id")), "doc_id")
        .transform(graft.ops.Materialize.materialize)
      val n = timed(s"audioPhash over $pairs real PCM WAVs") {
        graft.ops.Multimodal.audioPhash(clips, "doc_id", "payload")
          .count()
      }
      println(s"[seqfuzz-smoke]   fingerprinted clips = $n")
    }

    // `url` — the round-11 domain family at corpus scale: `rows`
    // synthetic URLs with the crawl-shaped hot-domain skew. The
    // claims under test: domainProfile is ONE hash aggregation
    // (O(domains) groups), and domainCap's bounded heap never sorts
    // the hot domain's docs through one task (vs the window form).
    if (phases("url")) {
      import org.apache.spark.sql.expressions.Window
      val docs = spark.range(rows).select(col("id").as("doc_id"),
        lit("w x y z q r s t").as("text"))
      val withUrl = graft.ops.UrlOps.synthUrl(docs, "doc_id")
      val prof = timed(s"domainProfile over $rows docs") {
        graft.ops.UrlOps.domainProfile(withUrl, "url", "text").count()
      }
      println(s"[seqfuzz-smoke]   domains = $prof")
      val kept = timed(s"domainCap(cap=100k) over $rows docs, heap") {
        graft.ops.UrlOps.domainCap(withUrl, "url", "doc_id",
          cap = 100000).count()
      }
      println(s"[seqfuzz-smoke]   kept docs = $kept")
      val keptH = timed(s"domainCapHash(cap=100k) over $rows docs") {
        graft.ops.UrlOps.domainCapHash(withUrl, "url", "doc_id",
          cap = 100000L).count()
      }
      println(s"[seqfuzz-smoke]   kept docs (hash) = $keptH")
      // the window comparison: rank-per-domain then filter — the
      // plan the heap replaces (full per-domain sort)
      val keptW = timed(s"window row_number cap over $rows docs") {
        val d = graft.ops.UrlOps.withDomain(withUrl, "url")
        d.withColumn("rn", row_number().over(Window
            .partitionBy("domain")
            .orderBy(graft.ops.Sampling.minstdHash(col("doc_id")).desc,
              col("doc_id"))))
          .where(col("rn") <= 100000).count()
      }
      println(s"[seqfuzz-smoke]   kept docs (window) = $keptW")
    }

    // `urlskew` — the case the hash form exists for, in isolation
    if (phases("urlskew")) {
      import org.apache.spark.sql.expressions.Window
      // the case the hash form exists for: ONE domain holding ~90%
      // of the corpus — the window plans a single-task sort of that
      // domain; the hash form's window touches only the
      // O(domains × buckets) histogram
      val skewed = spark.range(rows).select(col("id").as("doc_id"),
        when(col("id") % 10 < 9, lit("https://mega.example.com/p/1"))
          .otherwise(concat(lit("https://site"), col("id") % 97,
            lit(".net/p/1"))).as("url"))
      val keptSH = timed(s"domainCapHash, 90%-skewed $rows docs") {
        graft.ops.UrlOps.domainCapHash(skewed, "url", "doc_id",
          cap = 100000L).count()
      }
      println(s"[seqfuzz-smoke]   kept (hash, skew) = $keptSH")
      val keptSW = timed(s"window cap, 90%-skewed $rows docs") {
        val d = graft.ops.UrlOps.withDomain(skewed, "url")
        d.withColumn("rn", row_number().over(Window
            .partitionBy("domain")
            .orderBy(graft.ops.Sampling.minstdHash(col("doc_id")).desc,
              col("doc_id"))))
          .where(col("rn") <= 100000).count()
      }
      println(s"[seqfuzz-smoke]   kept (window, skew) = $keptSW")
    }

    spark.stop()
  }
}
