package graft

import org.apache.spark.sql.functions._
import graft.ops.Corpus
import graft.profiler.Stats
import graft.report.HtmlReport

/** Round-11 opening wave: pins the five ADVICE fixes — zero-gram
  * sources kept in the overlap manifest, per-column populations in
  * giniApprox, lhs-NULL semantics in FD discovery, and the
  * strictest-k privacy-card criterion. */
class Round11Spec extends SparkSpec {

  test("sourceOverlap emits pairs for sources with empty gram sets " +
      "(all docs shorter than n tokens)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "one two three four"),
      ("a", "one two three five"),
      ("b", "one two three four"),
      ("c", "tiny"), // < 3 tokens → zero 3-grams
      ("d", null.asInstanceOf[String])) // null text → zero grams
      .toDF("source", "text")
    val got = Corpus.sourceOverlap(df, "source", "text", n = 3)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // all C(4,2)=6 pairs present, including the zero-gram sources
    assert(got.size === 6)
    assert(got(("a", "c")) === ((3L, 0L, 0L)))
    assert(got(("c", "d")) === ((0L, 0L, 0L)))
    assert(got(("a", "b"))._3 === 2L) // the two shared grams
    // degenerate denominators yield NULL, not a crash / Infinity
    val cd = Corpus.sourceOverlap(df, "source", "text", n = 3)
      .where(col("src_a") === "c" && col("src_b") === "d")
      .select("jaccard").collect().head
    assert(cd.isNullAt(0))
    // the KMV sketch twin applies the same zero-gram-source rule
    val sk = Corpus.sourceOverlapSketch(df, "source", "text", n = 3,
        k = 16).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.isNullAt(4)))).toMap
    assert(sk.size === 6)
    assert(sk(("c", "d")) === ((0L, 0L, true))) // k_used 0, est NULL
    assert(sk(("a", "b"))._1 > 0L)
  }

  test("fdDiscover: nullable lhs can still report holds=true over " +
      "its defined rows") {
    val s = spark
    import s.implicits._
    // a→b holds on every row where a is defined; a has NULLs
    val df = Seq(
      (Some(1), "x"), (Some(1), "x"), (Some(2), "y"),
      (None: Option[Int], "x"), (None: Option[Int], "z"))
      .toDF("a", "b")
    val rows = Stats.fdDiscover(df, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    val ab = rows.find(r => r._1 == "a" && r._2 == "b").get
    assert(ab._3 === 2L) // distinct defined a
    assert(ab._4 === 2L) // distinct (a,b) over defined a
    assert(ab._5) // FD holds on defined rows
    val ba = rows.find(r => r._1 == "b" && r._2 == "a").get
    assert(!ba._5) // b=x maps to a∈{1,NULL} → 2 pairs vs eventually…
  }

  test("giniApprox uses each column's own non-null population " +
      "(no listwise deletion)") {
    val s = spark
    import s.implicits._
    // col u: uniform over defined rows; col v: nulls on DIFFERENT
    // rows — listwise na.drop would gut u's population
    val n = 2000
    val df = (0 until n).map { i =>
      val u = if (i % 2 == 0) Some(i.toDouble) else None
      val v = if (i % 2 == 1) Some(1.0) else None
      (u, v)
    }.toDF("u", "v")
    val got = Stats.giniApprox(df, Seq("u", "v"), buckets = 50)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // v is constant 1.0 over its own rows → gini ≈ 0
    assert(got("v").exists(g => math.abs(g) < 0.02))
    // u uniform on [0, n) → gini ≈ 1/3 over ITS rows; listwise
    // deletion would leave u's agg empty (None)
    assert(got("u").exists(g => math.abs(g - 1.0 / 3) < 0.03))
    // all-null column: contract None, no NPE
    val dfN = (0 until 10)
      .map(i => (i.toDouble, None: Option[Double])).toDF("x", "z")
    val gz = Stats.giniApprox(dfN, Seq("z"), buckets = 10).collect()
    assert(gz.head.isNullAt(1))
  }

  test("URL family: domain fold matches a driver-side re-derivation " +
      "and the cap is windowless, bounded and reproducible") {
    val s = spark
    import s.implicits._
    val n = 400
    val df = (0 until n).map(i => (i.toLong, s"w$i x y z")).toDF(
      "doc_id", "text")
    val d = graft.ops.UrlOps.withDomain(
      graft.ops.UrlOps.synthUrl(df, "doc_id"), "url")
    // driver-side independent re-derivation of host + domain
    def expect(id: Long): (String, String) = {
      val sub = if (id % 3 == 0) "www."
        else if (id % 3 == 1) s"cdn${id % 5}." else ""
      val dom = if (id % 10 < 4) s"hub${id % 2}" else s"site${id % 97}"
      val tld = if (id % 7 <= 2) "com" else if (id % 7 <= 4) "org"
        else if (id % 7 == 5) "net" else "io"
      (s"$sub$dom.$tld", s"$dom.$tld")
    }
    d.select("doc_id", "host", "domain").collect().foreach { r =>
      val (h, dm) = expect(r.getLong(0))
      assert(r.getString(1) === h)
      assert(r.getString(2) === dm)
    }
    // the cap: no Window node (bounded heap), counts = min(n, cap)
    val cap = 5
    val capped = graft.ops.UrlOps.domainCap(
      graft.ops.UrlOps.synthUrl(df, "doc_id"), "url", "doc_id", cap)
    assert(!capped.queryExecution.executedPlan.toString
      .contains("Window"), "domainCap must not plan a Window")
    val byDom = capped.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val totals = d.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (dm, cnt) =>
      assert(byDom(dm).length === math.min(cnt, cap.toLong)) }
    // reproducible selection: kept ids = smallest-rank under
    // (minstd DESC, id ASC), re-derived on the driver
    def minstd(id: Long): Long = {
      val m = 2147483647L; val a = 48271L
      val h0 = ((id + 12345) % m + m) % m
      ((h0 * a) % m) * a % m
    }
    val ids = df.collect().map(_.getLong(0))
    val wantTop = ids.groupBy(id => expect(id)._2).map { case (dm, g) =>
      dm -> g.sortBy(id => (-minstd(id), id)).take(cap).toSeq
    }
    byDom.foreach { case (dm, rows) =>
      assert(rows.sortBy(_._2).map(_._3).toSeq === wantTop(dm)) }
  }

  test("fusedCheck: all-true contract on an adversarial frame " +
      "(nulls, constants, negatives) with the right row inventory") {
    val s = spark
    import s.implicits._
    val df = (0 until 3000).map { i =>
      val x = if (i % 7 == 0) None else Some(i.toDouble - 1500)
      val k = if (i % 3 == 0) "a" else "b"
      (i.toLong, x, k, 1.0)
    }.toDF("id", "x", "cat", "const")
    val rows = graft.profiler.Profiler.fusedCheck(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(rows.forall(_._3), "every contract row must be true: " +
      rows.filterNot(_._3).mkString(", "))
    // inventory: table n + 3×4 count/missing/distinct + numeric
    // metrics for id/x/const + 5 quantile rows each
    assert(rows.count(_._2 == "distinct") === 4)
    assert(rows.count(_._2 == "median") === 3)
    // constant column: no var/sd/sk/ku (m2 = 0 on both sides)
    assert(!rows.exists(r => r._1 == "const" && r._2 == "sk"))
  }

  test("audioFingerprint: container-invariant, short-clip-safe, and " +
      "equal to a driver-side band-energy reconstruction") {
    import graft.ops.Multimodal
    // same tone under five different sample-rate headers → one hash
    val tones = (0 until 5).map { r =>
      Multimodal.decodeSamples(
        Multimodal.synthWavTone(8000L + 1000L * r, 1L, 200L, 879L)).get
    }
    val fps = tones.map(Multimodal.audioFingerprint(_))
    assert(fps.distinct.size === 1)
    // independent reconstruction from the tone formula
    def expectFp(n: Int, seed: Long): Long = {
      val e = new Array[Long](57)
      (0 until n).foreach { k =>
        val v = (seed + 7L * k) % 4096L - 2048L
        e(((k.toLong * 57) / n).toInt) += v * v
      }
      (0 until 56).map(j => if (e(j + 1) > e(j)) 1L << j else 0L)
        .foldLeft(0L)(_ | _)
    }
    assert(fps.head === expectFp(200, 879L))
    // short clip (fewer samples than bands): trailing bands are 0
    val short = Multimodal.decodeSamples(
      Multimodal.synthWavTone(8000L, 1L, 20L, 5L)).get
    assert(short.length === 20)
    assert(Multimodal.audioFingerprint(short) === expectFp(20, 5L))
  }

  test("decodeAudit: corrupt payloads land in an 'unknown' row with " +
      "zero decodes — loud, not fatal") {
    val s = spark
    import s.implicits._
    import graft.ops.Multimodal
    val rows = (0L until 20L).map { id =>
      val p =
        if (id % 2 == 0)
          Multimodal.synthPngRaster(16, 12, (id % 7).toInt * 41,
            (id % 5).toInt)
        else Array.tabulate(40)(i => ((id + i) % 251).toByte) // garbage
      (id, p)
    }.toDF("doc_id", "payload")
    val got = Multimodal.decodeAudit(rows, "doc_id", "payload")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("png") === ((10L, 10L, 0L)))
    assert(got("unknown") === ((10L, 0L, 10L)))
  }

  test("urlFilterStats: exact arm counts and first-failing-rule " +
      "precedence") {
    val s = spark
    import s.implicits._
    import graft.ops.UrlOps
    val n = 100
    val df = (0 until n).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val got = UrlOps.urlFilterStats(
        UrlOps.synthUrlDirty(df, "doc_id"), "url")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // arms 0,4 kept (40), 1 too_deep (20), 2 params (20), 3 cal (20)
    assert(got === Map("kept" -> 40L, "too_deep" -> 20L,
      "too_many_params" -> 20L, "calendar" -> 20L))
    // precedence: deep AND calendar AND params → first rule wins
    val both = Seq("https://x.com/a/b/c/d/e/2020/01/05?a=1&b=2&c=3")
      .toDF("url")
    val r = UrlOps.urlFilterStats(both, "url").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("too_deep"))
  }

  test("ngramJaccardPairsBlocked equals the unblocked pairs filtered " +
      "to same-block (no cap), and suppresses cross-block candidates") {
    val s = spark
    import s.implicits._
    import graft.ops.Dedup
    // duplicate texts planted ACROSS blocks: same text in en and fr
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, "en", base), (2L, "en", base + " iota"),
      (3L, "fr", base), (4L, "fr", base + " iota"),
      (5L, "en", "one two three four five six seven"),
      (6L, "de", base))
      .toDF("doc_id", "lang", "text")
    val blocked = Dedup.ngramJaccardPairsBlocked(df, "doc_id", "text",
        "lang", n = 3, minJaccard = 0.3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val langOf = df.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 3, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a2, b2, _) => langOf(a2) == langOf(b2) }
      .map { case (a2, b2, j) => (langOf(a2), a2, b2, j) }.toSet
    assert(blocked === want)
    // the cross-block duplicates (1,3), (1,6), (3,6)… are suppressed
    assert(!blocked.exists { case (_, a2, b2, _) =>
      langOf(a2) != langOf(b2) })
    assert(blocked.contains(("en", 1L, 2L,
      blocked.find(p => p._2 == 1L && p._3 == 2L).get._4)))
  }

  test("corpusDatasheet: sections are internally consistent " +
      "(doc totals agree, shares sum to 1, PII arms fire)") {
    val s = spark
    import s.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val d = graft.ops.UrlOps.synthUrl(
      graft.ops.Pii.synthPii(docs, "doc_id", "text"), "doc_id")
    val rows = graft.ops.Datasheet
      .corpusDatasheet(d, urlCol = Some("url")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    def sect(sec: String, m: String) =
      rows.filter(r => r._1 == sec && r._3 == m).map(_._4)
    val nDocs = docs.count().toDouble
    assert(sect("corpus", "n_docs").sum === nDocs)
    assert(sect("domains", "n_docs").sum === nDocs)
    assert(sect("dedup", "n_rows").sum === nDocs)
    assert(sect("pii", "n_docs").sum === nDocs)
    assert(math.abs(sect("corpus", "doc_share").sum - 1.0) < 1e-3)
    assert(math.abs(sect("domains", "doc_share").sum - 1.0) < 1e-2)
    // PII synthesis guarantees hits (2/3 of docs get an email)
    assert(sect("pii", "n_docs_with_pii").head > 0)
    assert(sect("pii", "n_emails").head > 0)
    // every section present
    assert(rows.map(_._1).distinct.sorted.toSeq ===
      Seq("corpus", "dedup", "domains", "pii", "quality"))
  }

  test("privacySection passes only at the strictest candidate k") {
    val curve = Seq((2L, 0L, 0L, 0.0), (10L, 3L, 12L, 0.1))
    // smallest group 5 satisfies k=2 but NOT k=10 → must fail
    assert(HtmlReport.privacySection(5L, curve).contains("qc-fail"))
    assert(HtmlReport.privacySection(10L, curve).contains("qc-pass"))
  }
}
