package graft

import org.apache.spark.sql.functions._

/** Round-13 robustness pins (the advisor's findings): the unigram
  * tokenizer's persisted-vocab OOV lifecycle, the KN count store's
  * crash-recovery contract, and the degenerate-training-slice guard
  * in KN scoring. */
class Round13Spec extends SparkSpec {

  test("segment() under a persisted vocab survives unseen characters" +
      " via the floored single-char fallback") {
    val s = spark
    import s.implicits._
    // vocab trained on a corpus whose alphabet is {a, b}
    val trainDocs = Seq((1L, "ab ab b ab")).toDF("doc_id", "text")
    val vocab = graft.ops.UnigramLm.train(trainDocs, "doc_id", "text",
      minCount = 1L)
    assert(!vocab.select("piece").as[String].collect().contains("x"))
    // encode a DIFFERENT corpus: 'axb' has an unseen middle char,
    // 'zz' is entirely unseen — the documented train-offline /
    // encode-later lifecycle that used to crash under ANSI
    val newDocs = Seq((10L, "axb ab zz")).toDF("doc_id", "text")
    val words = graft.ops.UnigramLm.wordCounts(newDocs, "doc_id",
      "text")
    val segs = graft.ops.UnigramLm.segment(words, vocab)
      .collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3)))
    // axb: no vocab piece ends at the 'x' position → single-char
    // fallback there; 'a'/'b' are real pieces
    assert(segs.filter(_._1 == "axb").sortBy(_._2).map(_._3).toSeq ==
      Seq("a", "x", "b"))
    // zz: EVERY position falls back (the word has no vocab spans at
    // all — the left join keeps it with an empty candidate set)
    assert(segs.filter(_._1 == "zz").sortBy(_._2).map(_._3).toSeq ==
      Seq("z", "z"))
    // the in-vocab word still segments normally
    assert(segs.filter(_._1 == "ab").map(_._3).toSeq == Seq("ab"))
    // and the document-level encoder runs end-to-end on it
    val enc = graft.ops.UnigramLm.encodeStats(newDocs, "doc_id",
        "text", vocab).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(10L) == ((3L, 6L))) // axb→3 + ab→1 + zz→2 pieces
  }

  test("loadKn falls back to counts_old when a compact crashed " +
      "between its two renames") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b a c")).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("kn_crash").toString
    graft.ops.Search.writeKnCounts(docs, "doc_id", "text", path)
    val before = graft.ops.Search.loadKn(spark, path)
      .big.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // simulate the crash window: counts has been renamed to
    // counts_old but the compacted tmp dir was never moved in
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$path/counts"),
      new org.apache.hadoop.fs.Path(s"$path/counts_old")))
    val after = graft.ops.Search.loadKn(spark, path)
      .big.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(after == before)
  }

  test("knScoreBigrams degrades to the probability floor when the " +
      "training slice has no bigrams (bi_types = 0)") {
    val s = spark
    import s.implicits._
    // only 1-token docs → empty bigram table, bi_types = 0
    val train = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val lm = graft.ops.Search.knTrain(train, "doc_id", "text")
    assert(lm.types.collect().head.getLong(0) == 0L)
    val probe = Seq((10L, "a b c")).toDF("doc_id", "text")
    val scored = graft.ops.Search.knScoreBigrams(
        graft.ops.Search.bigramPairsCarry(probe, "doc_id", "text",
          Nil), lm)
      .select("nl").as[Double].collect()
    // ANSI mode would have thrown DIVIDE_BY_ZERO here; instead every
    // bigram lands on the 1e-10 floor
    assert(scored.length == 2)
    assert(scored.forall(v => math.abs(v - (-math.log(1e-10))) < 1e-6))
  }

  test("ProfileStore v4: merged Spearman from rank co-moment state " +
      "matches the scan-side approx and the exact matrix within " +
      "the 0.05 contract, and survives compaction") {
    val s = spark
    import s.implicits._
    import graft.profiler.{ProfileStore, Stats}
    // b = a^3 monotone (rho = 1), c anti-monotone in a (rho = -1),
    // split into three "ingest days" by id stripe
    val base = (1 to 900).map { i =>
      (i.toLong, i.toDouble, math.pow(i.toDouble, 3.0),
        (901 - i).toDouble)
    }.toDF("id", "a", "b", "c")
    val path = java.nio.file.Files
      .createTempDirectory("spear_store").toString
    ProfileStore.writeSnapshot(
      base.where(col("id") % 3 === 0).drop("id"), path, "d0")
    ProfileStore.appendSnapshot(
      base.where(col("id") % 3 === 1).drop("id"), path, "d1")
    ProfileStore.appendSnapshot(
      base.where(col("id") % 3 === 2).drop("id"), path, "d2")
    val st = ProfileStore.mergedSpearmanApprox(spark, path)
      .map { case (x, y, r) => (x, y) -> r }.toMap
    assert(st.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // exact Spearman on the union: 1, -1, -1
    val ex = Stats.spearmanMatrix(base.drop("id"),
        Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    st.foreach { case (k, v) =>
      assert(math.abs(v - ex(k)) < 0.05,
        s"store $k -> $v vs exact ${ex(k)}")
    }
    // scan-side approx on the union agrees within the same contract
    val ap = Stats.spearmanApprox(base.drop("id"),
        Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    st.foreach { case (k, v) =>
      assert(math.abs(v - ap(k)) < 0.05) }
    // the store-rendered TableProfile surfaces the matrix
    assert(ProfileStore.storeProfile(spark, path)
      .spearman.map(t => (t._1, t._2)).toSet == st.keySet)
    // compaction folds the rank state too (exact merge — values
    // unchanged up to merge-order float noise inside sig5)
    ProfileStore.compactSnapshots(spark, path, Seq("d0", "d1"), "m01")
    val stC = ProfileStore.mergedSpearmanApprox(spark, path)
      .map { case (x, y, r) => (x, y) -> r }.toMap
    assert(stC.keySet == st.keySet)
    stC.foreach { case (k, v) =>
      assert(math.abs(v - st(k)) < 1e-3, s"compaction moved $k") }
  }

  test("incremental PageRank: append == rebuild on the edge store, " +
      "store-backed refresh == the frame form, and the warm start " +
      "tracks the converged ranks closer than a cold restart") {
    val s = spark
    import s.implicits._
    val day1 = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 1L), (2L, 3L))
      .toDF("src", "dst")
    val day2 = Seq((4L, 2L), (1L, 4L), (4L, 0L)).toDF("src", "dst")
    val all = day1.unionByName(day2)
    val path = java.nio.file.Files
      .createTempDirectory("pr_store").toString
    graft.ops.GraphOps.writeEdges(day1, "src", "dst", path)
    val r1 = graft.ops.GraphOps.pageRank(day1, "src", "dst", iters = 3)
    graft.ops.GraphOps.writeRanks(r1, path)
    graft.ops.GraphOps.appendEdges(day2, "src", "dst", path)
    // append == rebuild: the stored edge set is the union
    val stored = graft.ops.GraphOps.loadEdges(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == all.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // store-backed refresh == frame-form warm start
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaStore = m(graft.ops.GraphOps.pageRankIncremental(
      spark, path, iters = 2))
    val viaFrame = m(graft.ops.GraphOps.pageRankWarm(
      all, "src", "dst", r1, iters = 2))
    assert(viaStore == viaFrame)
    // warm start converges faster: after ONE refresh iteration the
    // warm vector is closer (L1) to the near-converged 20-iteration
    // ranks than one cold iteration from uniform is
    val ref = m(graft.ops.GraphOps.pageRank(all, "src", "dst",
      iters = 20))
    def l1(a: Map[Long, Double]) =
      ref.map { case (n, p) => math.abs(a(n) - p) }.sum
    val warm1 = m(graft.ops.GraphOps.pageRankWarm(all, "src", "dst",
      m(graft.ops.GraphOps.pageRank(all, "src", "dst", iters = 3))
        .toSeq.toDF("node", "pr"), iters = 1))
    val cold1 = m(graft.ops.GraphOps.pageRank(all, "src", "dst",
      iters = 1))
    assert(l1(warm1) < l1(cold1),
      s"warm ${l1(warm1)} !< cold ${l1(cold1)}")
  }

  test("TableProfile.spearman: approx populated by default, exact " +
      "under config, off when disabled") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.profiler.{Profiler, ProfilerConfig}
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("a", DoubleType),
      StructField("b", DoubleType), StructField("k", StringType)))
    // b = a^3 is a MONOTONIC but non-linear map: Spearman rho = 1
    // exactly while Pearson stays visibly below it
    val df = spark.createDataFrame(
      (1 to 200).map(i => Row(i.toDouble, math.pow(i.toDouble, 3.0),
        if (i % 2 == 0) "e" else "o")).asJava, schema)
    val p = Profiler.profile(df,
      ProfilerConfig(corrReject = 1.1)) // keep b un-rejected
    assert(p.spearman.map(t => (t._1, t._2)) == Seq(("a", "b")))
    // 200 distinct values across a 1024-point grid: approx rank is
    // near-exact; rho within the documented 0.05 contract of 1.0
    assert(math.abs(p.spearman.head._3 - 1.0) < 0.05)
    val pearson = p.correlations.find(t => t._1 == "a" && t._2 == "b")
      .map(_._3).get
    assert(pearson < 0.96)
    // exact path: average-rank Spearman is exactly 1 for a monotone map
    val pe = Profiler.profile(df,
      ProfilerConfig(corrReject = 1.1, exactSpearman = true))
    assert(pe.spearman.head._3 == 1.0)
    val off = Profiler.profile(df,
      ProfilerConfig(corrReject = 1.1, spearman = false))
    assert(off.spearman.isEmpty)
    // tidy carries the matrix; html renders the section
    val tidy = Profiler.profileTidy(df, ProfilerConfig(corrReject = 1.1))
      .where(col("metric") === "spearman_vs").collect()
    assert(tidy.length == 1 && tidy.head.getString(0) == "a" &&
      tidy.head.getString(3) == "b")
    val html = graft.report.HtmlReport.render(p)
    assert(html.contains("Spearman rank correlations"))
  }

  test("fused profile honors cfg.spearman and matches the pass-based " +
      "approx matrix on the same input") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.profiler.{Profiler, ProfilerConfig}
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("a", DoubleType),
      StructField("b", DoubleType)))
    val df = spark.createDataFrame(
      (1 to 100).map(i => Row(i.toDouble, (101 - i).toDouble)).asJava,
      schema)
    val f = Profiler.profileFused(df, ProfilerConfig(corrReject = 1.1))
    assert(f.spearman.map(t => (t._1, t._2)) == Seq(("a", "b")))
    assert(math.abs(f.spearman.head._3 - (-1.0)) < 0.05)
    assert(Profiler.profileFused(df,
      ProfilerConfig(spearman = false)).spearman.isEmpty)
  }
}
