package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{QualityRules, Search}

/** Dev utility: Kneser–Ney LM + quality-rule gate at corpus scale —
  * measures the claims the operators make:
  *  - KN TRAINING is three map-side-combined aggregates of the
  *    bigram stream (O(bigram types) model, Zipf-bounded);
  *  - KN SCORING is the bigram stream joined against the model on
  *    token keys (the model is the broadcast-able small side);
  *  - the rule FUNNEL is two token-stream aggregations with all
  *    funnel arithmetic on the O(rules) aggregate;
  *  - the ppl-bucket AUDIT form pays one sort window per language —
  *    measured here to justify the GK-threshold corpus path.
  *
  * Corpus: the [[BpeScaleSmoke]] generator shape — `docs` documents
  * of 40 Zipf-ish words from a ~50k synthetic vocabulary
  * (deterministic multiplicative hashing, no RNG), written to
  * parquet so the scan is real; lang = doc_id % 8 so per-language
  * windows have real partitions.
  *
  * Usage: `graft.LmScaleSmoke [docs] [phases]`, phases CSV from
  * `train,score,funnel,buckets,incremental,trigram,ccnet,lr,
  * tfidf,unigram,curate` (default train,score,funnel,buckets). */
object LmScaleSmoke {
  def main(args: Array[String]): Unit = {
    val docs = if (args.length > 0) args(0).toLong else 10000000L
    val phases = (if (args.length > 1) args(1) else
      "train,score,funnel,buckets").split(",").map(_.trim).toSet
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
      println(f"[lm-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val path = "/tmp/graft_lm_smoke"
    def gen(ids: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val letters = typedLit(('a' to 'z').map(_.toString))
      def letter(idx: org.apache.spark.sql.Column) =
        element_at(letters, (idx + 1).cast("int"))
      val w = (1 to 40).map { i =>
        val h = pmod(col("id") * lit(2654435761L) + lit(i * 40503L),
          lit(1048576L)).cast("double") / lit(1048576.0)
        val wid = (h * h * lit(50000.0)).cast("long")
        concat(
          letter(pmod(wid, lit(26L))),
          letter(pmod(wid / 26L, lit(26L))),
          letter(pmod(wid / 676L, lit(26L))),
          when(wid >= 17576L, letter(pmod(wid / 17576L, lit(26L))))
            .otherwise(lit("")),
          when(wid >= 456976L, lit("x")).otherwise(lit("")))
      }
      ids.select(col("id").as("doc_id"),
        pmod(col("id"), lit(8L)).cast("string").as("lang"),
        concat_ws(" ", w: _*).as("text"))
    }
    timed(s"generate + write $docs docs x 40 words") {
      gen(spark.range(docs).toDF("id"))
        .write.mode("overwrite").parquet(path)
    }
    val corpus = spark.read.parquet(path)
    val lmPath = "/tmp/graft_lm_smoke_model"
    if (phases("train")) timed("KN train (3 model aggregates, " +
        "persisted)") {
      val lm = Search.knTrain(corpus, "doc_id", "text")
      lm.big.write.mode("overwrite").parquet(s"$lmPath/big")
      lm.left.write.mode("overwrite").parquet(s"$lmPath/left")
      lm.cont.write.mode("overwrite").parquet(s"$lmPath/cont")
      lm.types.write.mode("overwrite").parquet(s"$lmPath/types")
      println(s"[lm-smoke] bigram types = " +
        spark.read.parquet(s"$lmPath/big").count())
    }
    val lm = Search.KnLm(
      spark.read.parquet(s"$lmPath/big"),
      spark.read.parquet(s"$lmPath/left"),
      spark.read.parquet(s"$lmPath/cont"),
      spark.read.parquet(s"$lmPath/types"), 0.75)
    if (phases("score")) timed("KN score all docs vs frozen model") {
      val scored = Search.knScoreBigrams(
        Search.bigramPairsCarry(corpus, "doc_id", "text", Nil), lm)
        .groupBy("doc_id").agg(avg("nl").as("nll"))
      println(s"[lm-smoke] scored docs = ${scored.count()}")
    }
    if (phases("funnel")) timed("rule funnel (first-fail accounting)") {
      QualityRules.filterFunnel(corpus, "doc_id", "text",
        minTokens = 30L, maxTokens = 60L,
        minMeanWordLen = 3.1, maxMeanWordLen = 3.6,
        minStopwords = 0L, maxTopTokenFrac = 0.3)
        .collect().foreach(r => println(s"[lm-smoke] funnel $r"))
    }
    if (phases("incremental")) {
      val storePath = "/tmp/graft_lm_smoke_store"
      timed("KN store write (full corpus counts)") {
        Search.writeKnCounts(corpus, "doc_id", "text", storePath)
      }
      val batch = gen(spark.range(docs, docs + 100000L).toDF("id"))
      timed("KN store append (100k-doc daily batch)") {
        Search.appendKnCounts(batch, "doc_id", "text", storePath)
      }
      timed("KN store load + merge-on-read (model rebuild)") {
        println(s"[lm-smoke] merged bigram types = " +
          Search.loadKn(spark, storePath).big.count())
      }
      timed("KN store compact") {
        Search.compactKnCounts(spark, storePath)
      }
    }
    if (phases("trigram")) timed("order-3 KN train + score " +
        "(five model aggregates + trigram-stream joins)") {
      val scored = Search.knTrigramNll(corpus, corpus, "doc_id",
        "text")
      println(s"[lm-smoke] trigram-scored docs = ${scored.count()}")
    }
    if (phases("ccnet")) timed("ccnet end-to-end funnel (gate + LM " +
        "cut + near-dedup + decontamination)") {
      // target = a held-out 1% slice with the same distribution
      val target = gen(spark.range(docs, docs + docs / 100).toDF("id"))
      // thresholds matched to the synthetic corpus (40-token docs,
      // no English stopwords in the generated vocabulary)
      // maxDf 64 — the DedupScaleSmoke operating point for Zipf
      // synthetic corpora at this scale (the 1000 default leaves a
      // sub-cap df band whose df² pair fan-out dominates everything)
      val counts = graft.pipeline.CorpusPipeline.ccnetCounts(
        corpus, target, "doc_id", "text", "lang",
        th = graft.ops.QualityRules.Thresholds(30L, 60L, 3.0, 10.0,
          0L, 0.3),
        cfg = graft.pipeline.CorpusPipeline.FunnelConfig(maxDf = 64L))
      counts.collect().foreach(r => println(s"[lm-smoke] ccnet $r"))
    }
    if (phases("lr")) {
      // thresholds matched to the generator (nt is constant 40, so
      // the word-length band and repetition cap carry the labels)
      // band top at the corpus mwl MEDIAN (3.4) so labels split
      // ~50/50 on a linearly separable, one-sided signal
      val th = QualityRules.Thresholds(30L, 60L, 3.1, 3.4, 0L, 0.3)
      // materialized ONCE (the trainScored contract): moments +
      // iterations + scorer are iters+3 passes that would otherwise
      // each re-run the token folds
      val feats = timed("LR featurize (materialized feature frame)") {
        graft.ops.Materialize.materialize(
          graft.ops.Classifier.featurize(corpus, "doc_id", "text", th))
      }
      val m = timed("LR train (5 GD iterations, one " +
          "map-side-combined agg each)") {
        graft.ops.Classifier.train(feats, iters = 5)
      }
      println(s"[lm-smoke] final w = ${m.weights.toSeq}")
      timed("LR score + exact AUC (bounded rank window)") {
        graft.ops.Classifier.auc(
            graft.ops.Classifier.scored(feats, m))
          .collect().foreach(r => println(s"[lm-smoke] auc $r"))
      }
    }
    if (phases("curate")) timed("model-gated curate funnel (train " +
        "LR + model keep + near-dedup + decontamination)") {
      val target = gen(spark.range(docs, docs + docs / 100).toDF("id"))
      val counts = graft.pipeline.CorpusPipeline.curateCounts(
        corpus, target, "doc_id", "text",
        graft.ops.QualityRules.Thresholds(30L, 60L, 3.1, 3.4, 0L, 0.3),
        cfg = graft.pipeline.CorpusPipeline.FunnelConfig(maxDf = 64L))
      counts.collect().foreach(r => println(s"[lm-smoke] curate $r"))
    }
    if (phases("unigram")) {
      val vocab = timed("unigram hard-EM train (distinct-word DP)") {
        val v = graft.ops.UnigramLm.train(corpus, "doc_id", "text")
        println(s"[lm-smoke] unigram vocab = ${v.count()}")
        v
      }
      timed("unigram encode stats (per-word pieces joined back)") {
        println(s"[lm-smoke] encoded docs = " +
          graft.ops.UnigramLm.encodeStats(corpus, "doc_id", "text",
            vocab).count())
      }
    }
    if (phases("tfidf")) timed("tfidf top-3 keywords per doc (one " +
        "(doc,token) shuffle + O(vocab) df + per-doc rank windows)") {
      val out = graft.ops.TextStats.tfidfTopK(corpus, "doc_id",
        "text", k = 3)
      println(s"[lm-smoke] tfidf rows = ${out.count()}")
    }
    if (phases("buckets")) timed("ppl buckets (8-language sort-window " +
        "audit form)") {
      val b = Search.knPplBuckets(corpus, corpus, "doc_id", "text",
        "lang")
      println(s"[lm-smoke] bucket rows = ${b.count()}")
    }
    spark.stop()
  }
}
