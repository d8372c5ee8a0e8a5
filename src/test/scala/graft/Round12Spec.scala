package graft

import org.apache.spark.sql.functions._
import graft.ops.{QualityRules, Sampling, Search}
import graft.report.HtmlReport

/** Round-12 opening wave: pins the ADVICE fixes — datasheet metric
  * formatting decided by metric NAME (not the value's floor
  * equality), and the shared gram derivation reused by the blocked
  * near-dup variant (covered by the dedup_ngram_blocked oracle; the
  * carry-column refactor is pinned there). */
class Round12Spec extends SparkSpec {

  test("datasheetHtml keeps float style for float metrics that land " +
      "on integral values, integer style for count metrics") {
    val rows = Seq(
      ("quality", "en", "avg_quality", 1.0), // integral VALUE, float METRIC
      ("quality", "de", "avg_quality", 0.83112),
      ("corpus", "web", "n_docs", 12345.0),
      ("domains", "site1.com", "is_hot", 1.0),
      ("corpus", "web", "doc_share", 0.25))
    val html = HtmlReport.datasheetHtml(rows)
    // avg_quality=1.0 must render in the same %.5g style as its
    // column-mates, not flip to the integer "1"
    assert(html.contains("<td>1.0000</td>"),
      "integral-valued float metric must keep float formatting")
    assert(html.contains("<td>0.83112</td>"))
    // count metrics render as grouped integers
    assert(html.contains("<td>12,345</td>"))
    assert(html.contains("<td>1</td>"))
    assert(html.contains("<td>25.0%</td>"))
  }

  test("knBigramNll matches the closed-form interpolated KN " +
      "probabilities, including both backoff tiers") {
    val s = spark
    import s.implicits._
    // train bigrams: (a,b)×2, (b,a)×1, (a,c)×1
    //   c(a·)=3 N1+(a·)=2 | c(b·)=1 N1+(b·)=1 | T=3
    //   Pcont(a)=Pcont(b)=Pcont(c)=1/3
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b"), // seen bigram: (2−.75 + .75·2·⅓)/3 = 1.75/3
      (11L, "a a"), // unseen pair, seen context: (.75·2·⅓)/3 = 1/6
      (12L, "z q")) // fully unseen: 1e-10 floor
      .toDF("doc_id", "text")
    val got = Search.knBigramNll(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got(10L)._1 == 1L)
    assert(math.abs(got(10L)._2 - (-math.log(1.75 / 3.0))) < 1e-4)
    assert(math.abs(got(11L)._2 - (-math.log(1.0 / 6.0))) < 1e-4)
    assert(math.abs(got(12L)._2 - (-math.log(1e-10))) < 1e-4)
  }

  test("filterFunnel assigns each doc its FIRST failing rule, keeps " +
      "zero-count rule rows, and filterDocs equals the kept row") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // fails too_few_tokens AND stopwords — precedence picks idx 0
      (1L, "x y z"),
      // 5 tokens, mean word length 1 → mean_word_length (idx 2)
      (2L, "p q r s t"),
      // good length/wl but zero stopwords → too_few_stopwords
      (3L, "alpha beta gamma delta hello"),
      // stopwords ok, but one token is 3/6 of the doc → repetitive
      (4L, "the echo echo echo is echo"),
      // passes everything
      (5L, "the alpha is beta and gamma of delta"))
      .toDF("doc_id", "text")
    val funnel = QualityRules.filterFunnel(docs, "doc_id", "text",
      minTokens = 5L, maxTokens = 50L,
      minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
      minStopwords = 1L, maxTopTokenFrac = 0.5)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(4))).toMap
    assert(funnel("too_few_tokens") == ((1L, 4L)))
    assert(funnel("too_many_tokens") == ((0L, 4L))) // zero-count row kept
    assert(funnel("mean_word_length") == ((1L, 3L)))
    assert(funnel("too_few_stopwords") == ((1L, 2L)))
    assert(funnel("repetitive") == ((1L, 1L)))
    assert(funnel("kept") == ((1L, 1L)))
    val kept = QualityRules.filterDocs(docs, "doc_id", "text",
      minTokens = 5L, maxTokens = 50L,
      minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
      minStopwords = 1L, maxTopTokenFrac = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(5L))
  }

  test("knBigramNllByBlock isolates models per block: the same text " +
      "scores in-distribution in its block, floors in a foreign or " +
      "unseen block") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "en", "x y x y"), (2L, "de", "x z"))
      .toDF("doc_id", "lang", "text")
    val score = Seq((10L, "en", "x y"), (11L, "de", "x y"),
      (12L, "fr", "x y")).toDF("doc_id", "lang", "text")
    val got = graft.ops.Search.knBigramNllByBlock(train, score,
        "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // en: c(x,y)=2, c(x·)=2, N1+(x·)=1, Pcont(y)=1/2
    //   → (2−.75 + .75·1·(1/2))/2 = 1.625/2
    assert(math.abs(got(10L) - (-math.log(1.625 / 2.0))) < 1e-4)
    // de: context x seen, pair unseen, Pcont_de(y)=0 → floor
    assert(math.abs(got(11L) - (-math.log(1e-10))) < 1e-4)
    // fr: block absent from training → floor
    assert(math.abs(got(12L) - (-math.log(1e-10))) < 1e-4)
  }

  test("knPplBuckets cuts integer terciles per language with " +
      "monotone bucket boundaries") {
    val s = spark
    import s.implicits._
    // 6 docs, increasingly repetitive → distinct nll ranks
    val docs = (1L to 6L).map { i =>
      val rare = (1L to i).map(k => s"rare${i}_$k").mkString(" ")
      (i, "en", s"a b a b a b $rare")
    }.toDF("doc_id", "lang", "text")
    val got = graft.ops.Search.knPplBuckets(docs, docs,
        "doc_id", "text", "lang")
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getDouble(4))).toMap
    assert(got.keySet == Set("head", "middle", "tail"))
    assert(got("head")._1 == 2L && got("middle")._1 == 2L &&
      got("tail")._1 == 2L)
    assert(got("head")._2 <= got("middle")._2)
    assert(got("middle")._2 <= got("tail")._2)
  }

  test("funnelSection renders rules in order, badges heavy eaters, " +
      "and renders nothing on empty input") {
    val rows = Seq(
      (0L, "too_few_tokens", 300L, 0.3, 700L),
      (1L, "too_many_tokens", 0L, 0.0, 700L),
      (5L, "kept", 700L, 0.7, 700L))
    val html = HtmlReport.funnelSection(rows)
    assert(html.contains("700 of 1,000 kept") ||
      html.contains("700 of 1000 kept"))
    assert(html.contains("EATING")) // 30% > the 20% badge threshold
    assert(html.indexOf("<td>too_few_tokens") <
      html.indexOf("<td>kept</td>"))
    assert(HtmlReport.funnelSection(Nil) == "")
  }

  test("plan shapes: ruleAssign is exchange-free (map-only), and " +
      "KN scoring / pageRank plan no cartesian product") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c the is"), (2L, "x y z a b"))
      .toDF("doc_id", "text")
    // the 10M-doc measurement said the gate is ONE map-only scan —
    // pin it: no Exchange anywhere in the per-doc assignment
    val assignPlan = QualityRules.ruleAssign(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"),
      s"ruleAssign must be map-only, got:\n$assignPlan")
    val lm = Search.knTrain(docs, "doc_id", "text")
    val knPlan = Search.knScoreBigrams(
        Search.bigramPairsCarry(docs, "doc_id", "text", Nil), lm)
      .queryExecution.executedPlan.toString
    assert(!knPlan.contains("CartesianProduct"),
      "KN scoring must broadcast the 1-row type total, not plan a " +
        "cartesian product")
    val prPlan = graft.ops.GraphOps.pageRank(
        Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst",
        iters = 2)
      .queryExecution.executedPlan.toString
    assert(!prPlan.contains("CartesianProduct"))
  }

  test("incremental KN store: write + append + load ≡ retraining on " +
      "the union corpus, and compaction preserves the model") {
    val s = spark
    import s.implicits._
    val day1 = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val day2 = Seq((3L, "a b c a"), (4L, "b b")).toDF("doc_id", "text")
    val probe = Seq((10L, "a b c"), (11L, "b a b")).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("kn_store").toString
    graft.ops.Search.writeKnCounts(day1, "doc_id", "text", path)
    graft.ops.Search.appendKnCounts(day2, "doc_id", "text", path)
    def scores(lm: graft.ops.Search.KnLm) =
      graft.ops.Search.knScoreBigrams(
          graft.ops.Search.bigramPairsCarry(probe, "doc_id", "text",
            Nil), lm)
        .groupBy("doc_id")
        .agg(graft.det.Sig.sig5(avg("nl")).as("nll"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = graft.ops.Search.knTrain(day1.unionByName(day2),
      "doc_id", "text")
    val loaded = graft.ops.Search.loadKn(spark, path)
    // count tables identical → identical scores
    assert(loaded.big.collect().map(r => (r.getString(0),
        r.getString(1), r.getLong(2))).toSet ==
      full.big.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet)
    assert(scores(loaded) == scores(full))
    // compaction folds the two delta files into one, same model
    graft.ops.Search.compactKnCounts(spark, path)
    assert(scores(graft.ops.Search.loadKn(spark, path)) == scores(full))
  }

  test("a NULL-text document fails too_few_tokens instead of " +
      "falling through every NULL comparison into kept") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]),
      (2L, "the alpha is beta and gamma of delta"))
      .toDF("doc_id", "text")
    val got = QualityRules.ruleAssign(docs, "doc_id", "text",
        minTokens = 5L, maxTokens = 50L, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, minStopwords = 1L,
        maxTopTokenFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L) // too_few_tokens, not kept
    assert(got(2L) == 5L)
  }

  test("interpolated KN is a proper distribution: P(·|w1) sums to 1 " +
      "over the continuation vocabulary for every seen context") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val words = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 20L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(12))(
        words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val lm = Search.knTrain(docs, "doc_id", "text")
    val big = lm.big.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val left = lm.left.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cont = lm.cont.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val types = lm.types.collect().head.getLong(0).toDouble
    val d = 0.75
    for ((w1, (c1, n1f)) <- left) {
      // .toSeq: Map.keys is a Set, and mapping a Set by the
      // probability VALUE would deduplicate equal probabilities
      val mass = cont.keys.toSeq.map { w2 =>
        val c = big.getOrElse((w1, w2), 0L).toDouble
        (math.max(c - d, 0.0) + d * n1f * (cont(w2) / types)) / c1
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9,
        s"P(·|$w1) sums to $mass, not 1")
    }
  }

  test("order-3 KN is a proper distribution: P(·|w1,w2) sums to 1 " +
      "for every seen trigram context (normalization survives the " +
      "recursive continuation backoff)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 15L).map(i =>
      (i, Seq.fill(4 + rnd.nextInt(10))(
        words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    // rebuild the model frames exactly as knTrigramNll does
    val tri = docs.selectExpr("doc_id",
        "split(text, ' ') AS w")
      .selectExpr("explode(transform(sequence(0, size(w)-3), " +
        "i -> struct(w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3))) AS b")
      .select("b.w1", "b.w2", "b.w3")
      .groupBy("w1", "w2", "w3").count()
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2)) -> r.getLong(3)).toMap
    val t2 = tri.keys.groupBy(k => (k._2, k._3)).map { case (k, v) =>
      k -> v.size.toLong }
    val t2ctx = t2.keys.toSeq.groupBy(_._1).map { case (w2, ks) =>
      w2 -> (ks.map(t2).sum, ks.size.toLong) }
    val cont = t2.keys.toSeq.groupBy(_._2).map { case (w3, ks) =>
      w3 -> ks.size.toLong }
    val bT = t2.size.toDouble
    val d = 0.75
    def pc(w3: String) = cont.getOrElse(w3, 0L) / bT
    def p2(w2: String, w3: String) = t2ctx.get(w2) match {
      case Some((tc, n2)) =>
        (math.max(t2.getOrElse((w2, w3), 0L) - d, 0.0) +
          d * n2 * pc(w3)) / tc
      case None => pc(w3)
    }
    val ctxs = tri.keys.toSeq.map(k => (k._1, k._2)).distinct
    for ((w1, w2) <- ctxs) {
      val seen = tri.keys.toSeq.filter(k => k._1 == w1 && k._2 == w2)
      val c3ctx = seen.map(tri).sum.toDouble
      val n3 = seen.size
      val mass = cont.keys.toSeq.map { w3 =>
        (math.max(tri.getOrElse((w1, w2, w3), 0L) - d, 0.0) +
          d * n3 * p2(w2, w3)) / c3ctx
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9,
        s"P(·|$w1,$w2) sums to $mass")
    }
    // and the operator's own output is finite and positive
    val out = Search.knTrigramNll(docs, docs, "doc_id", "text")
      .collect()
    assert(out.length == 15 && out.forall(_.getDouble(2) > 0))
  }

  test("pageRank matches the closed-form damped power iteration") {
    val s = spark
    import s.implicits._
    // 1→{2,3}, 2→1, 3→1: after one iteration from uniform 1/3,
    //   p(1) = 0.15/3 + 0.85·(1/3 + 1/3)        = 0.61666…
    //   p(2) = p(3) = 0.15/3 + 0.85·(1/3)/2     = 0.19166…
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val got = graft.ops.GraphOps.pageRank(edges, "src", "dst",
        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - (0.05 + 0.85 * 2.0 / 3.0)) < 1e-4)
    assert(math.abs(got(2L) - (0.05 + 0.85 / 6.0)) < 1e-4)
    assert(math.abs(got(3L) - got(2L)) < 1e-9)
    // mass is conserved (no dangling nodes by contract)
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("hits matches the closed-form two-iteration hand computation") {
    val s = spark
    import s.implicits._
    // 1→{2,3}, 2→3, 3→1. From all-ones:
    //   h1 = (2,1,1); a1 = (1,2,3); h2 = (5,3,1); a2 = (1,5,8)
    //   Σh = 9, Σa = 14 → hub(1) = 5/9, authority(3) = 8/14
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val got = graft.ops.GraphOps.hits(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(got(1L)._1 - 5.0 / 9.0) < 1e-4)
    assert(math.abs(got(3L)._2 - 8.0 / 14.0) < 1e-4)
    assert(math.abs(got(2L)._2 - 5.0 / 14.0) < 1e-4)
    // L1-normalized: each score family sums to 1
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("tfidfTopK matches the closed-form smooth-idf scores") {
    val s = spark
    import s.implicits._
    // N=2; df: a=1, b=2, c=1 -> idf(a)=idf(c)=ln(3/2)+1, idf(b)=1
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = graft.ops.TextStats.tfidfTopK(docs, "doc_id", "text",
        k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getDouble(3))).toMap
    val idfRare = math.log(3.0 / 2.0) + 1.0
    assert(got((1L, 1L))._1 == "a")
    assert(math.abs(got((1L, 1L))._2 - 2.0 * idfRare) < 1e-4)
    assert(got((1L, 2L)) == (("b", 1.0))) // ubiquitous term: idf 1
    assert(got((2L, 1L))._1 == "c" && got((2L, 2L))._1 == "b")
  }

  test("splitLeakage: a near-dup pair straddling the naive hash " +
      "split is healed by the cluster-representative split") {
    val s = spark
    import s.implicits._
    // minstd milles: id 0 → 227 (train), id 8 → 932 (test)
    val docs = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 8L, 1.0)).toDF("id_a", "id_b", "jaccard")
    val clusters = Seq((0L, 0L), (8L, 0L)).toDF("doc_id", "cluster_id")
    val got = Sampling.splitLeakage(docs, pairs, clusters, "doc_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("naive") == ((1L, 1L)))       // the pair leaks
    assert(got("cluster_rep") == ((1L, 0L))) // the rep split heals it
  }
}
