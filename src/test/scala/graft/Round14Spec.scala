package graft

import org.apache.spark.sql.functions._

/** Round-14 pins: the banded production near-dup plan
  * (minhashVerifiedPairs) agrees with the exact inverted-index plan,
  * its star cap degrades pairs but never cluster connectivity, the
  * funnel strategy dispatch is value-invariant, and the AC automaton
  * serializes only its pattern list. */
class Round14Spec extends SparkSpec {

  private def fixtureDocs = {
    val s = spark
    import s.implicits._
    // three near-dup families + unrelated docs; texts long enough
    // for 3-gram shingles to discriminate
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (10L, "spark streams shuffle partitions across the cluster fast"),
      (11L, "spark streams shuffle partitions across the cluster slowly"),
      (20L, "completely unrelated text about gardens and flowers here"),
      (21L, "another unrelated document mentioning compilers and parsers")
    ).toDF("doc_id", "text")
  }

  test("minhashVerifiedPairs == ngramJaccardPairs (pairs AND values)") {
    val docs = fixtureDocs
    val exact = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id",
      "text", n = 3, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val banded = graft.ops.Dedup.minhashVerifiedPairs(docs, "doc_id",
      "text", n = 3, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty) // the fixture really has near-dups
    assert(banded.toSeq == exact.toSeq) // bitwise: same division arithmetic
  }

  test("star cap bounds the pair list but keeps cluster connectivity") {
    val s = spark
    import s.implicits._
    // one 6-member near-identical family: every banded bucket holds
    // all 6 docs, so cap=2 forces star linking
    val family = (0 until 6).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta " +
        s"iota kappa tag$i")).toDF("doc_id", "text")
    val capped = graft.ops.Dedup.minhashVerifiedPairs(family, "doc_id",
      "text", n = 3, minJaccard = 0.3, maxBucket = Some(2L))
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // star form: fewer than the C(6,2)=15 all-pairs edges...
    assert(pairs.length < 15 && pairs.nonEmpty)
    // ...but the cluster frame is the full family under one rep
    val cl = graft.ops.Dedup.duplicateClustersStar(capped)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cl.map(_._2).distinct.toSeq == Seq(0L))
    assert(cl.map(_._1).sorted.toSeq == (0L until 6L))
  }

  test("funnel strategy dispatch is value-invariant on the fixture") {
    val docs = fixtureDocs.withColumn("text",
      concat_ws(" ", (1 to 5).map(_ => col("text")): _*))
    // 5x-repeated texts pass the funnel's 20-token quality floor
    val evalDocs = docs.where(col("doc_id") >= 20L)
    val corpus = docs.where(col("doc_id") < 20L)
    val exact = graft.pipeline.CorpusPipeline.funnelCounts(
      corpus, evalDocs, "doc_id", "text").collect()(0)
    val banded = graft.pipeline.CorpusPipeline.funnelCounts(
      corpus, evalDocs, "doc_id", "text",
      graft.pipeline.CorpusPipeline.BandedConfig).collect()(0)
    assert(banded == exact)
  }

  test("quantilesRouted satisfies the rank contract on both paths") {
    val s = spark
    import s.implicits._
    // k: key-like (all distinct — routes to GK under maxDomain=16);
    // e: enum-like (3 values — stays exact, margin 1)
    val df = (1L to 1000L).map(i => (i, (i % 3).toInt))
      .toDF("k", "e")
    val out = graft.profiler.Stats.quantilesRouted(df, Seq("k", "e"),
      maxDomain = 16L).collect()
    assert(out.length == 10)
    assert(out.forall(_.getBoolean(2)), "a rank bound failed")
    // and with a domain cap that admits both, still all-true
    val out2 = graft.profiler.Stats.quantilesRouted(df, Seq("k", "e"),
      maxDomain = 100000L).collect()
    assert(out2.forall(_.getBoolean(2)))
  }

  test("quantilesRouted exact path holds at non-integral p*n") {
    val s = spark
    import s.implicits._
    // 1010 fully-distinct ints on the EXACT branch: p*n = 50.5 at
    // p05 while percentile interpolates at rank p*(n-1)+1 = 51.45 —
    // a p*n-anchored bound fails here on perfectly correct data
    // (lo = 51 > 50.5), which is the r14-review regression this pins
    val df = (1L to 1010L).toDF("k")
    val out = graft.profiler.Stats.quantilesRouted(df, Seq("k"),
      maxDomain = 100000L).collect()
    assert(out.length == 5)
    assert(out.forall(_.getBoolean(2)),
      "exact interpolation-rank bound failed")
  }

  test("groupedQuantilesRouted contract holds incl. an empty cell") {
    val s = spark
    import s.implicits._
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", null), ("c", null))
      .toDF("g", "v")
    val out = graft.profiler.Stats.groupedQuantilesRouted(
      df, "g", Seq("v")).collect()
    assert(out.length == 15) // 3 groups x 1 col x 5 percentiles
    assert(out.forall(_.getBoolean(3)))
  }

  test("contaminationPairsRouted is value-identical on both branches") {
    val s = spark
    import s.implicits._
    val train = (1L to 30L).map(i =>
      (i, s"doc number $i about spark shuffles and partitions today " +
        (if (i % 7 == 0) "leaked eval benchmark question text here" else "")))
      .toDF("doc_id", "text")
    val eval = Seq((100L,
      "the leaked eval benchmark question text here verbatim"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = rows(graft.ops.Dedup.contaminationPairs(
      train, eval, "doc_id", "text", n = 3, minShared = 3L))
    assert(exact.nonEmpty)
    // threshold above the corpus -> exact branch; below -> bloom
    val hi = rows(graft.ops.Dedup.contaminationPairsRouted(
      train, eval, "doc_id", "text", n = 3, minShared = 3L,
      bloomAboveRows = 1000L))
    val lo = rows(graft.ops.Dedup.contaminationPairsRouted(
      train, eval, "doc_id", "text", n = 3, minShared = 3L,
      bloomAboveRows = 5L))
    assert(hi == exact && lo == exact)
  }

  test("minhashVerifiedPairs plan shape: no shingle self-join, no " +
      "cartesian — candidates come from the banded bucket key") {
    val docs = fixtureDocs
    val qe = graft.ops.Dedup.minhashVerifiedPairs(docs, "doc_id",
      "text", n = 3, minJaccard = 0.5).queryExecution
    val physical = qe.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    // the quadratic signature of the exact plan is the inverted-index
    // self-join keyed on the shingle hash; the banded plan must join
    // on (band, bh) and the candidate ids only
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val shingleKeyed = joins.exists(_.condition.exists(
      _.references.exists(_.name == "shingle")))
    assert(!shingleKeyed, "banded plan must never self-join on shingle")
  }

  test("progressive JPEG: flat fixture == baseline == luma formula") {
    import graft.ops.Jpeg
    for (seed <- Seq(0, 41, 82, 123); wh <- Seq((32, 24), (17, 9), (8, 8))) {
      val (w, h) = wh
      val pb = Jpeg.decodePixels(Jpeg.synthJpegRaster(w, h, seed)).get
      val pp = Jpeg.decodePixels(
        Jpeg.synthJpegRasterProgressive(w, h, seed)).get
      assert(pp.width == w && pp.height == h && pp.channels == 3)
      assert(pb.data.sameElements(pp.data), s"seed=$seed ${w}x$h")
      assert((pp.data(0) & 0xff) == Jpeg.blockLuma(0, 0, seed))
    }
  }

  test("progressive JPEG: random coefficients roundtrip == baseline," +
      " both approximation chains") {
    import graft.ops.Jpeg
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val w = 8 + rnd.nextInt(50)
      val h = 8 + rnd.nextInt(40)
      val nComp = if (trial % 2 == 0) 1 else 3
      val quant = Array.fill(64)(1 + rnd.nextInt(16))
      // pure function of (ci, bx, by): sparse small coefficients —
      // |v| ≤ 7 keeps every point-transformed size within the table
      def coefs(ci: Int)(bx: Int, by: Int): Array[Int] = {
        val r2 = new scala.util.Random(ci * 1000003 + bx * 1009 + by)
        val b = new Array[Int](64)
        b(0) = r2.nextInt(255) - 127
        for (_ <- 0 until r2.nextInt(20))
          b(r2.nextInt(63) + 1) = r2.nextInt(15) - 7
        b
      }
      val base = Jpeg.decodePixels(
        Jpeg.encodeBaseline(w, h, nComp, 1, 1, quant, coefs)).get
      for (acAl <- Seq(0, 1)) {
        val prog = Jpeg.decodePixels(Jpeg.encodeProgressive(
          w, h, nComp, 1, 1, quant, coefs, acAl = acAl)).get
        assert(prog.width == base.width && prog.height == base.height)
        assert(base.data.sameElements(prog.data),
          s"trial=$trial ${w}x$h nComp=$nComp acAl=$acAl")
      }
    }
  }

  test("AcAutomaton serialized state is the pattern list, not tables") {
    val terms = (0 until 200).map(i => s"pattern$i bad term")
    val ac = new graft.functions.AcAutomaton(
      terms.map(_.getBytes("UTF-8")).toArray)
    // force the tables to exist, then serialize
    assert(ac.count("xx pattern7 bad term yy".getBytes).sum == 1L)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ac); oos.close()
    val patternBytes = terms.map(_.length).sum
    // serialized form ~ the pattern bytes (plus java object overhead),
    // nowhere near the ~nStates KiB dense tables (~3.6 MiB here)
    assert(bos.size() < 64 * patternBytes + 16384,
      s"AC serialized to ${bos.size()} bytes — tables leaked into the plan?")
    // and the deserialized automaton rebuilds working tables
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val ac2 = in.readObject().asInstanceOf[graft.functions.AcAutomaton]
    assert(ac2.count("pattern42 bad term pattern42 bad term".getBytes)
      .sum == 2L)
  }
}
