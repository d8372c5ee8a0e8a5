package graft

import org.apache.spark.sql.functions._
import graft.ops.{Corpus, Privacy}

/** Round-10 session-5 additions: corpus overlap (exact + KMV),
  * token-budget planning, reproducible shuffle, privacy audits. */
class CorpusPrivacySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("kAnonymity flags small groups with 1/n risk") {
    val df = Seq(
      ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z"),
      ("a", 2, "x"),
      ("b", 1, "x"), ("b", 1, "y")
    ).toDF("seg", "nat", "payload")
    val out = Privacy.kAnonymity(df, Seq("seg", "nat"), k = 3L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 1, 3L, graft.det.Sig.sig5(1.0 / 3), false),
      ("a", 2, 1L, 1.0, true),
      ("b", 1, 2L, 0.5, true)))
  }

  test("lDiversity: homogeneous-sensitive group is flagged even when large") {
    val df = Seq(
      // group (a,1): 4 rows but only 1 distinct sensitive value
      ("a", 1, 10L), ("a", 1, 10L), ("a", 1, 10L), ("a", 1, 10L),
      // group (b,1): 3 rows, 3 distinct values
      ("b", 1, 1L), ("b", 1, 2L), ("b", 1, 3L)
    ).toDF("seg", "nat", "sens")
    val out = Privacy.lDiversity(df, Seq("seg", "nat"), col("sens"), l = 2L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(("a", 4L, 1L, true), ("b", 3L, 3L, false)))
  }

  test("property: kAnonymize output always satisfies k-anonymity " +
      "and is maximal") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = Gen.listOfN(60, for {
      a <- Gen.oneOf("p", "q", "r")
      b <- Gen.chooseNum(0, 5)
    } yield (a, b))
    (0 until 6).foreach { i =>
      val rows = rowGen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = rows.toDF("seg", "nat")
      (2L to 12L by 5L).foreach { k =>
        val out = Privacy.kAnonymize(df, Seq("seg", "nat"), k)
        // invariant 1: no surviving group is below k
        val audit = Privacy.kAnonymity(out, Seq("seg", "nat"), k)
          .where(col("at_risk")).count()
        assert(audit == 0L, s"seed=$i k=$k violates k-anonymity")
        // invariant 2 (maximality): kept = all rows of safe groups
        val safe = Privacy.kAnonymity(df, Seq("seg", "nat"), k)
          .where(!col("at_risk")).agg(sum("n")).head()
        val expect = if (safe.isNullAt(0)) 0L else safe.getLong(0)
        assert(out.count() == expect, s"seed=$i k=$k not maximal")
      }
    }
  }

  test("kAnonymize keeps exactly the rows the audit marks safe") {
    val df = Seq(
      ("a", 1, "r1"), ("a", 1, "r2"), ("a", 1, "r3"),
      ("a", 2, "r4"),
      ("b", 1, "r5"), ("b", 1, "r6")
    ).toDF("seg", "nat", "payload")
    val out = Privacy.kAnonymize(df, Seq("seg", "nat"), k = 2L)
    assert(out.columns.toSeq == df.columns.toSeq,
      "all columns preserved")
    assert(out.select("payload").as[String].collect().sorted.toSeq ==
      Seq("r1", "r2", "r3", "r5", "r6"), "only the singleton dropped")
    // consistency with the audit: kept rows = rows NOT at_risk
    val safeRows = Privacy.kAnonymity(df, Seq("seg", "nat"), 2L)
      .where(!col("at_risk"))
      .agg(sum("n")).head().getLong(0)
    assert(out.count() == safeRows)
  }

  test("riskCurve counts groups and rows below each k") {
    val df = (Seq.fill(5)("g1") ++ Seq.fill(2)("g2") ++ Seq("g3"))
      .zipWithIndex.map { case (g, i) => (g, i) }.toDF("qi", "i")
    val out = Privacy.riskCurve(df, Seq("qi"), Seq(2L, 5L, 10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // sizes: 5, 2, 1 over 8 rows
    assert(out.toSeq == Seq(
      (2L, 1L, 1L, graft.det.Sig.sig5(1.0 / 8)),
      (5L, 2L, 3L, graft.det.Sig.sig5(3.0 / 8)),
      (10L, 3L, 8L, 1.0)))
  }

  test("sourceOverlap: known gram sets, zero pairs emitted") {
    // a: grams {p q r, q r s} ; b: {p q r, q r t} ; c: {x y z, y z w}
    val df = docs(
      (1L, "a", "p q r s"),
      (2L, "b", "p q r t"),
      (3L, "c", "x y z w"))
    val out = Corpus.sourceOverlap(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // a∩b = {p q r} → J = 1/3; a∩c = b∩c = 0
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 2L, 1L, graft.det.Sig.sig5(1.0 / 3)),
      ("a", "c", 2L, 2L, 0L, 0.0),
      ("b", "c", 2L, 2L, 0L, 0.0)))
    // containments on the a/b pair: 1/2 each
    val ab = Corpus.sourceOverlap(df, "source", "text")
      .where(col("src_a") === "a" && col("src_b") === "b")
      .select("c_a", "c_b").head()
    assert(ab.getDouble(0) == 0.5 && ab.getDouble(1) == 0.5)
  }

  test("sourceOverlapSketch equals exact when k covers the union") {
    // synthetic sources with controlled overlap: shared prefix docs
    val shared = (0 until 6).map(i =>
      (100L + i, "sA", s"common text block number $i alpha beta")) ++
      (0 until 6).map(i =>
        (200L + i, "sB", s"common text block number $i alpha beta"))
    val own = Seq(
      (300L, "sA", "only in source a entirely distinct words here"),
      (301L, "sB", "unique to b nothing shared with anyone at all"))
    val df = docs(shared ++ own: _*)
    val exact = Corpus.sourceOverlap(df, "source", "text")
      .select("src_a", "src_b", "jaccard").as[(String, String, Double)]
      .collect().map { case (a, b, j) => ((a, b), j) }.toMap
    val est = Corpus.sourceOverlapSketch(df, "source", "text", k = 4096)
      .select("src_a", "src_b", "est_jaccard")
      .as[(String, String, Double)].collect()
    assert(est.nonEmpty)
    est.foreach { case (a, b, e) =>
      assert(math.abs(e - exact((a, b))) < 1e-12,
        s"k >= |union| must make KMV exact for ($a,$b)") }
  }

  test("sourceOverlapSketch plan is window-free") {
    val df = docs((1L, "a", "p q r s"), (2L, "b", "p q r t"))
    val plan = Corpus.sourceOverlapSketch(df, "source", "text", k = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "sketch path must not sort partitions")
  }

  test("tokenBudget: targets, epochs and zero-weight sources") {
    val df = docs(
      (1L, "a", "one two three four"), // 4 tokens
      (2L, "a", "five six"),           // 2
      (3L, "b", "seven eight nine"))   // 3
    val out = Corpus.tokenBudget(df, "source", "text",
      Map("a" -> 0.75, "b" -> 0.25), budget = 12L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", 2L, 6L, 0.75, 9L, 1.5),
      ("b", 1L, 3L, 0.25, 3L, 1.0)))
    val zero = Corpus.tokenBudget(df, "source", "text",
      Map("a" -> 1.0), budget = 10L)
      .where(col("source") === "b").head()
    assert(zero.getDouble(3) == 0.0 && zero.getLong(4) == 0L &&
      zero.getDouble(5) == 0.0)
  }

  test("plan shapes: kendall cells and hard-negatives are window-free") {
    val df = (1L to 100L).map(i => (i.toDouble, (i * 7 % 50).toDouble))
      .toDF("x", "y")
    val kp = graft.profiler.Stats.kendallGrid(df, Seq(("x", "y")))
      .queryExecution.executedPlan.toString
    assert(!kp.contains("Window"),
      "kendall pair math must stay on the O(bins²) cell frame")
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(8)((i % 5).toFloat), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val hp = graft.ops.Similarity.hardNegatives(emb, "vec_id",
      "embedding", "label", numQueries = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(!hp.contains("Window"),
      "hard negatives must rank through the bounded heap, not a window")
  }

  test("property: TableDiff of a table with itself is all-same") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val g = Gen.listOfN(40, for {
      id <- Gen.chooseNum(0L, 60L)
      v <- Gen.option(Gen.alphaStr.map(_.take(4)))
    } yield (id, v))
    (0 until 4).foreach { i =>
      val rows = g(Gen.Parameters.default, Seed(i.toLong)).get
        .distinctBy(_._1)
      val df = rows.toDF("id", "v")
      val sum = graft.ops.TableDiff.diffSummary(df, df, Seq("id"),
        Seq("v")).collect()
      assert(sum.length == 1 && sum.head.getString(0) == "same" &&
        sum.head.getLong(1) == rows.length.toLong, s"seed=$i")
    }
  }

  test("gini: known distributions (equal=0, winner-takes-all→1)") {
    val eq = Seq.fill(50)(10.0).zipWithIndex.map(_.swap)
      .toDF("i", "x")
    assert(graft.profiler.Stats.gini(eq, Seq("x")).head()
      .getDouble(2) == 0.0)
    // one unit each for n−1 rows, one huge holder: G → (n−1)/n
    val wta = (Seq.fill(99)(0.0) :+ 990000.0).zipWithIndex
      .map(_.swap).toDF("i", "x")
    val g = graft.profiler.Stats.gini(wta, Seq("x")).head().getDouble(2)
    assert(math.abs(g - 0.99) < 1e-9)
    // negative values refuse (NULL), rather than a wrong number
    val neg = Seq(-1.0, 2.0, 3.0).zipWithIndex.map(_.swap)
      .toDF("i", "x")
    assert(graft.profiler.Stats.gini(neg, Seq("x")).head().isNullAt(2))
  }

  test("concentration: uniform vs dominated columns") {
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"c$i"))
      .zipWithIndex.map(_.swap).toDF("i", "k")
      .withColumn("u", col("i") % 4)
    val out = graft.profiler.Stats.concentration(df, Seq("k", "u"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) == 100L && k.getLong(2) == 11L)
    assert(k.getDouble(5) == 0.9, "top share")
    assert(math.abs(k.getDouble(3) - (0.9 * 0.9 + 10 * 0.0001)) < 1e-9,
      "HHI")
    val u = out("u")
    assert(u.getDouble(4) == 4.0,
      "uniform 4-value column has 4 effective categories")
  }

  test("TableDiff: statuses, null-safe compare, detail rows") {
    val v1 = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d"))).toDF("id", "v")
    val v2 = Seq((1L, Some("a")), (2L, Some("B")), (3L, None),
      (5L, Some("e"))).toDF("id", "v")
    val sum = graft.ops.TableDiff.diffSummary(v1, v2, Seq("id"),
      Seq("v")).collect().map(r => (r.getString(0), r.getLong(1)))
    // 1 same, 2 changed, 3 same (NULL <=> NULL), 4 removed, 5 added
    assert(sum.toSeq == Seq(("added", 1L), ("changed", 1L),
      ("removed", 1L), ("same", 2L)))
    val rows = graft.ops.TableDiff.diffRows(v1, v2, Seq("id"),
      Seq("v")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "changed"), (4L, "removed"),
      (5L, "added")))
  }

  test("phashNearDupPairs: banded recall complete at hamming<=3, once each") {
    val base = 0x00F0F0F0F0F0F0L
    val hashes = Seq(
      (1L, base),
      (2L, base ^ 0x7L),          // hamming 3 (one band differs)
      (3L, base ^ 0x0FL),         // hamming 4: excluded despite 3 shared bands
      (4L, base),                 // identical to 1
      (5L, base ^ (1L << 55))     // hamming 1 in the TOP band
    ).toDF("id", "h")
    val out = graft.ops.Multimodal.phashNearDupPairs(hashes, "id", "h",
      maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // d(1,2)=3, d(1,4)=0, d(1,5)=1, d(2,3)=1 (0x7^0xF=0x8),
    // d(2,4)=3, d(4,5)=1; excluded: d(1,3)=4, d(2,5)=4, d(3,4)=4,
    // d(3,5)=5 — each pair exactly once despite multiple shared bands
    assert(out.toSeq == Seq((1L, 2L, 3L), (1L, 4L, 0L), (1L, 5L, 1L),
      (2L, 3L, 1L), (2L, 4L, 3L), (4L, 5L, 1L)))
  }

  test("skewAdvisor: hot-key shares and salt factors") {
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "i")
    val out = graft.profiler.Stats.skewAdvisor(df, Seq("k"), topK = 2,
      targetRowsPerTask = 40L).collect()
    assert(out.length == 2)
    val top = out.head
    assert(top.getString(2) == "hot" && top.getLong(3) == 90L)
    assert(top.getDouble(4) == 0.9)
    assert(top.getLong(5) == 3L, "ceil(90/40) = 3 tasks worth of salt")
    assert(out(1).getLong(5) == 1L, "cold keys need no salt")
  }

  test("ngramEntropy: uniform corpus hits log2(k) exactly; " +
      "degenerate corpus reads zero") {
    // 4 equally frequent tokens → H1 = 2 bits, perplexity 4;
    // all bigrams distinct once each within docs
    val uni = Seq("a b", "c d", "a b", "c d").toDF("text")
    val e = graft.ops.TextStats.ngramEntropy(uni, "text").collect()
    val u = e.find(_.getLong(0) == 1L).get
    assert(u.getLong(1) == 8L && u.getLong(2) == 4L)
    assert(u.getDouble(3) == 2.0 && u.getDouble(4) == 4.0)
    val b = e.find(_.getLong(0) == 2L).get
    // bigrams: "a b" ×2, "c d" ×2 → H2 = 1 bit; H(w2|w1) = 1−2 = −1?
    // no — bigram N = 4, two distinct each ×2 → H2 = 1.0
    assert(b.getLong(1) == 4L && b.getLong(2) == 2L)
    assert(b.getDouble(3) == 1.0)
    assert(b.getDouble(5) == -1.0, "cond = H2 - H1")
    // single repeated token: zero entropy, perplexity 1
    val mono = Seq("x x x x x").toDF("text")
    val m = graft.ops.TextStats.ngramEntropy(mono, "text")
      .where(col("n") === 1L).head()
    assert(m.getDouble(3) == 0.0 && m.getDouble(4) == 1.0)
  }

  test("intervalOverlapJoin: exact pairs once each, touching excluded") {
    val iv = Seq(
      (1L, 0L, 10000L),   // overlaps 2 and 3
      (2L, 5000L, 25000L), // spans 3 buckets at bucketUs=10k
      (3L, 9999L, 10001L),
      (4L, 10000L, 10000L), // zero-length, touches 1's end: no overlap
      (5L, 40000L, 50000L)  // disjoint
    ).toDF("iv_id", "s", "e")
    val out = graft.ops.TemporalJoin.intervalOverlapJoin(
      iv, iv, "s", "e", bucketUs = 10000L,
      Seq("iv_id"), Seq("iv_id"),
      col("a_iv_id") < col("b_iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2))
    // (1,2): [5000,10000) = 5000; (1,3): [9999,10000) = 1;
    // (2,3): [9999,10001) = 2 — each exactly once despite interval 2
    // spanning buckets 0..2. The zero-length point 4 at 10000 TOUCHES
    // 1's end (excluded: b.s < a.e is strict) but sits strictly
    // INSIDE 2 and 3 (included, overlap_us 0 — a point-in-open-
    // interval hit, same semantics as the naive predicate).
    assert(out.toSeq == Seq((1L, 2L, 5000L), (1L, 3L, 1L),
      (2L, 3L, 2L), (2L, 4L, 0L), (3L, 4L, 0L)))
  }

  test("trendByType recovers an exact line; degenerate groups emit NULL") {
    import java.sql.Timestamp
    def t(hr: Long) = new Timestamp(hr * 3600000L)
    // "lin": y = 2·hours + 3 exactly; "flat": all at the same instant
    val rows = (0L to 10L).map(h => (t(h), "lin", 2.0 * h + 3.0)) ++
      Seq((t(1L), "flat", 1.0), (t(1L), "flat", 9.0))
    val df = rows.toDF("ts", "event_type", "value")
    val out = graft.ops.EventOps.trendByType(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val lin = out("lin")
    assert(lin.getLong(1) == 11L)
    assert(math.abs(lin.getDouble(2) - 2.0) < 1e-9, "slope")
    assert(math.abs(lin.getDouble(3) - 3.0) < 1e-9, "intercept")
    assert(lin.getDouble(4) == 1.0, "r2")
    val flat = out("flat")
    assert(flat.isNullAt(2) && flat.isNullAt(3) && flat.isNullAt(4),
      "constant-time group must not emit ±Inf")
  }

  test("containmentPairs finds the short-in-long quote Jaccard misses") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = docs((1L, "s", long), (2L, "s", quote), (3L, "s", other))
      .select("doc_id", "text")
    val cont = graft.ops.Dedup.containmentPairs(df, "doc_id", "text",
      minContain = 0.9).collect()
    assert(cont.length == 1)
    val r = cont.head
    // quote (10 grams) fully inside long (58 grams): c_b = 1.0,
    // c_a = 10/58
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(3) == 1.0)
    assert(math.abs(r.getDouble(2) - graft.det.Sig.sig5(10.0 / 58)) < 1e-12)
    // Jaccard at the usual 0.5 threshold is blind to this pair
    assert(graft.ops.Dedup.ngramJaccardPairs(df, "doc_id", "text",
      minJaccard = 0.5).count() == 0L)
  }

  test("sourceOverlap: single source emits zero pairs; saturation " +
      "buckets partition first-sight counts") {
    val one = docs((1L, "only", "p q r s t"))
    assert(graft.ops.Corpus.sourceOverlap(one, "source", "text")
      .count() == 0L)
    // 10 docs, ids 0..9, each with its own unique grams → bucket i
    // gets exactly doc i's gram count; cumulative sums to the total
    val d = (0L until 10L).map(i =>
      (i, "s", s"a$i b$i c$i d$i e$i")).toSeq
    val curve = graft.ops.TextStats.saturationCurve(
      docs(d: _*), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(curve.map(_._1).toSeq == (0L until 10L))
    assert(curve.forall(_._2 == 3L), "5 tokens → 3 unique 3-grams each")
    assert(curve.last._3 == 30L, "cumulative reaches the corpus total")
  }

  test("writeShuffled round-trips the training order by shard") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shuf").toString
    val df = (0L until 200L).map(i => (i, s"payload$i"))
      .toDF("id", "payload")
    graft.ops.Corpus.writeShuffled(df, "id", dir, shards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200L)
    assert(back.columns.toSet ==
      Set("id", "payload", "pos", "shard"))
    // coordinates in the data equal a fresh shuffle derivation
    val expect = graft.ops.Corpus.reproducibleShuffle(
        df.select("id"), "id", 4)
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .toMap
    back.select("id", "shard", "pos").collect().foreach { r =>
      val (s, p) = expect(r.getLong(0))
      assert(r.getInt(1).toLong == s && r.getLong(2) == p)
    }
  }

  test("kendallGrid equals exact tau-b on integer data within grid range") {
    // deterministic integer pairs with ties, values within 10 bins
    val rng = new scala.util.Random(7)
    val xs = Array.fill(400)(rng.nextInt(10).toLong)
    val ys = xs.zipWithIndex.map { case (x, i) =>
      if (i % 3 == 0) rng.nextInt(10).toLong else (x + rng.nextInt(3)) % 10 }
    val df = xs.zip(ys).toSeq.toDF("x", "y")
    // brute-force exact tau-b
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length) {
      val dx = java.lang.Long.compare(xs(i), xs(j))
      val dy = java.lang.Long.compare(ys(i), ys(j))
      if (dx == 0 && dy == 0) { tx += 1; ty += 1 }
      else if (dx == 0) tx += 1
      else if (dy == 0) ty += 1
      else if (dx == dy) conc += 1
      else disc += 1
    }
    val n0 = xs.length.toLong * (xs.length - 1) / 2
    val exact = (conc - disc).toDouble /
      (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
    val row = graft.profiler.Stats.kendallGrid(df, Seq(("x", "y")),
      bins = 10).head()
    assert(row.getLong(3) == conc && row.getLong(4) == disc,
      s"pair counts: got (${row.getLong(3)}, ${row.getLong(4)}), " +
        s"want ($conc, $disc)")
    assert(math.abs(row.getDouble(5) - exact) < 1e-5)
    // perfect monotone and perfect reversal
    val mono = (1L to 50L).map(i => (i, i * 2)).toDF("x", "y")
    assert(graft.profiler.Stats.kendallGrid(mono, Seq(("x", "y")), 50)
      .head().getDouble(5) == 1.0)
    val rev = (1L to 50L).map(i => (i, 100L - i)).toDF("x", "y")
    assert(graft.profiler.Stats.kendallGrid(rev, Seq(("x", "y")), 50)
      .head().getDouble(5) == -1.0)
  }

  test("reproducibleShuffle: bijective, contiguous, partition-invariant") {
    val df = (0L until 500L).toDF("id")
    val a = Corpus.reproducibleShuffle(df, "id", shards = 8)
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every id exactly once
    assert(rows.map(_._3).sorted.toSeq == (0L until 500L))
    // pos contiguous from 1 within each shard
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length.toLong)) }
    // identical coordinates regardless of input partitioning
    val b = Corpus.reproducibleShuffle(df.repartition(13), "id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._3).toSeq == b.sortBy(_._3).toSeq)
  }
}
