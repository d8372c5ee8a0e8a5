package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.HeavyHitters
import graft.ops.{Dedup, KMeansOp, TextStats}

/** Round-6 operators and plan-shape guarantees: distributed
  * vocabulary top-k, capped semantic dedup, exact heavy hitters. */
class Round6OpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, docSchema)

  // ---------------------------------------------------------------
  // vocab: scale shape
  // ---------------------------------------------------------------

  test("vocab: head is a distributed TakeOrderedAndProject, not a " +
      "full-vocab single-partition window") {
    val d = docs((0L until 20L).map(i => i -> s"tok$i common common"): _*)
    val q = TextStats.vocab(d, "text", topK = 3)
    val rows = q.collect()
    // 21 distinct tokens: common=40, tok0..tok19=1 → head is common,
    // then ties broken by token order.
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq((1L, "common", 40L), (2L, "tok0", 1L),
        (3L, "tok1", 1L)))
    assert(rows.forall(_.getAs[Long]("n_vocab") == 21L))
    assert(math.abs(rows(0).getAs[Double]("share") - 40.0 / 60) < 1e-4)
    // The plan must take the head via a per-partition top-k heap
    // (TakeOrderedAndProject) so only k·partitions rows leave any
    // executor; a billion-token vocabulary never crosses one
    // partition. The (bounded) rank window sits ABOVE that limit.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab head must plan as TakeOrderedAndProject, got:\n$plan")
  }

  // ---------------------------------------------------------------
  // SemDeDup maxCluster cap
  // ---------------------------------------------------------------

  test("semanticDupPairs: maxCluster turns an adversarial cell into " +
      "star edges, connectivity unchanged") {
    // the SemDeDup worst case: many near-identical embeddings all
    // landing in ONE cell — uncapped that is C(m,2) pairs
    val vecSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val blob = spark.createDataFrame(
      (0L until 100L).map(i => Row(i, Seq(1.0, 2.0, 3.0, 4.0))).asJava,
      vecSchema)
    val capped = KMeansOp.semanticDupPairs(blob, "vec_id", "embedding",
      seedLo = 0L, seedHi = 1L, dim = 4, minCosine = 0.9,
      maxCluster = Some(50L))
    val cRows = capped.collect()
    // star linking: m−1 edges, every one anchored at the cell's min id
    assert(cRows.length == 99)
    assert(cRows.forall(r => r.getAs[Long]("id_a") == 0L))
    assert(cRows.forall(r => r.getAs[Double]("cosine") == 1.0))
    val uncapped = KMeansOp.semanticDupPairs(blob, "vec_id", "embedding",
      seedLo = 0L, seedHi = 1L, dim = 4, minCosine = 0.9,
      maxCluster = None)
    assert(uncapped.count() == 100L * 99 / 2) // the quadratic blow-up
    // the keep-one decision the pairs feed is identical: same
    // clusters, same representatives
    val cc = Dedup.duplicateClusters(capped).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cu = Dedup.duplicateClusters(uncapped).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cc == cu)
  }

  // ---------------------------------------------------------------
  // exact heavy hitters (two-pass) + oversized-item serialization
  // ---------------------------------------------------------------

  private val itemSchema = StructType(Seq(StructField("it", StringType)))
  private def items(xs: String*) =
    spark.createDataFrame(xs.map(Row(_)).asJava, itemSchema)

  test("heavyHittersExact: sketch-then-recount equals the plain " +
      "exact answer") {
    // n = 20: a=9, b=6, c=3, d=2; k=2 → threshold n/3 ≈ 6.67, so
    // only a passes even though the sketch may retain b as a
    // candidate — the exact recount filters it
    val d = items(Seq.fill(9)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(3)("c") ++ Seq.fill(2)("d"): _*).repartition(4)
    val r = HeavyHitters.heavyHittersExact(d, "it", k = 2).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq
      == Seq(("a", 9L)))
    assert(math.abs(r(0).getAs[Double]("share") - 0.45) < 1e-9)
    // k=3 → threshold 5: a and b
    val r3 = HeavyHitters.heavyHittersExact(d, "it", k = 3).collect()
    assert(r3.map(x => (x.getString(0), x.getLong(1))).toSeq
      == Seq(("a", 9L), ("b", 6L)))
    // empty stream → empty result, not a crash
    assert(HeavyHitters.heavyHittersExact(
      items().repartition(2), "it", k = 2).collect().isEmpty)
  }

  test("mg: items over 65535 UTF-8 bytes survive partial-buffer " +
      "serialization") {
    // writeUTF would throw UTFDataFormatException here; the
    // length-prefixed encoding must round-trip the key intact
    val big = "x" * 70000
    val d = items(Seq.fill(6)(big) ++ Seq.fill(2)("small"): _*)
      .repartition(4) // forces serialize/merge of partial buffers
    val r = d.agg(HeavyHitters.mg(col("it"), 4).as("mg"))
      .select(col("mg.n"), col("mg.items")).collect()(0)
    assert(r.getLong(0) == 8L)
    val m = r.getMap[String, Long](0 + 1)
    assert(m(big) == 6L) // |vocab| ≤ k → exact counts
    assert(m("small") == 2L)
  }

  // ---------------------------------------------------------------
  // FD / key claims + duplicate rows
  // ---------------------------------------------------------------

  test("fdCheck: holding and violated dependencies, NULLs stay " +
      "row-valued; duplicateRows counts literal copies") {
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", StringType)))
    val d = spark.createDataFrame(Seq(
      Row(1L, "x", "p"), Row(2L, "x", "q"), Row(3L, null, "p"),
      Row(3L, null, "p") // literal duplicate row
    ).asJava, schema)
    val r = graft.profiler.Stats.fdCheck(d, Seq(
        Seq("a") -> Seq("b"),    // holds (incl. the NULL b for a=3)
        Seq("b") -> Seq("c"),    // violated: b=x → p and q
        Seq("a", "b") -> Seq())) // key check: duplicate row ⇒ holds
      .collect().map(x => (x.getString(0), x.getString(1),
        x.getLong(4), x.getBoolean(5))).toSeq
    assert(r == Seq(("a", "b", 0L, true), ("a,b", "*", 0L, true),
      ("b", "c", 1L, false)))
    val dup = graft.profiler.Stats.duplicateRows(d).collect()(0)
    assert((dup.getLong(0), dup.getLong(1), dup.getLong(2))
      == ((4L, 3L, 1L)))
  }

  // ---------------------------------------------------------------
  // retention + anomalies
  // ---------------------------------------------------------------

  private val DayNs = 86400L * 1000000000L

  test("retention: cohort by first-seen day, distinct users per " +
      "offset") {
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val d = spark.createDataFrame(Seq(
      Row(1L, 0L * DayNs, 10L, 1.0), Row(2L, 1L * DayNs, 10L, 1.0),
      Row(3L, 0L * DayNs, 20L, 1.0),
      Row(4L, 1L * DayNs, 30L, 1.0), Row(5L, 3L * DayNs, 30L, 1.0)
    ).asJava, schema)
    val r = graft.ops.EventOps.retention(d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((0L, 0L, 2L), (0L, 1L, 1L),
      (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("funnel: strict ordering — a purchase before the view does " +
      "not convert") {
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val us = 1000000000L // 1s in ns
    val d = spark.createDataFrame(Seq(
      // user 1: full ordered funnel
      Row(1L, 1L * us, 1L, "view"), Row(2L, 2L * us, 1L, "click"),
      Row(3L, 3L * us, 1L, "purchase"),
      // user 2: purchase BEFORE view → stops at click
      Row(4L, 1L * us, 2L, "purchase"), Row(5L, 2L * us, 2L, "view"),
      Row(6L, 3L * us, 2L, "click"),
      // user 3: view only
      Row(7L, 1L * us, 3L, "view")
    ).asJava, schema)
    val r = graft.ops.EventOps.funnel(d).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, "view", 3L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("anomalies: flags only |z| > 3 on the rounded score; " +
      "single-event users emit nothing") {
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val rows = (1L to 12L).map(i => Row(i, 0L, 1L, 0.0)) ++
      Seq(Row(13L, 0L, 1L, 100.0), Row(14L, 0L, 2L, 5.0))
    val d = spark.createDataFrame(rows.asJava, schema)
    val r = graft.ops.EventOps.anomalies(d).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(13L))
    assert(r(0).getAs[Double]("z") > 3.0)
  }

  // ---------------------------------------------------------------
  // mergeable HLL sketches
  // ---------------------------------------------------------------

  test("hll: shard-union and global sketches both sit in the error " +
      "envelope (union may be MORE accurate — exact coupon shards)") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("shard", StringType)))
    val d = spark.createDataFrame(
      (0L until 500L).map(i => Row(i, s"s${i % 7}")).asJava, schema)
      .repartition(4)
    val perShard = d.groupBy("shard")
      .agg(expr("hll_sketch_agg(id)").as("sk"))
    val merged = perShard
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("m"))
      .collect()(0).getLong(0)
    val global = d.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(id))").as("g"))
      .collect()(0).getLong(0)
    // estimate EQUALITY is deliberately not asserted: small shards
    // stay in DataSketches' exact coupon mode, so the union can beat
    // the already-promoted single-pass sketch (observed 500 vs 494)
    assert(math.abs(merged - 500L) <= 25L)
    assert(math.abs(global - 500L) <= 25L)
    // partition-order independence of the merged path
    val merged2 = d.repartition(13).groupBy("shard")
      .agg(expr("hll_sketch_agg(id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("m"))
      .collect()(0).getLong(0)
    assert(merged2 == merged)
  }

  // ---------------------------------------------------------------
  // BPE pair counts + embedding drift
  // ---------------------------------------------------------------

  test("bpePairs: counts adjacent in-token char pairs, rank ties by " +
      "pair") {
    val d = docs(0L -> "abab cd", 1L -> "ab x")
    // pairs: abab → ab, ba, ab; cd → cd; ab → ab  (x is length-1)
    val q = TextStats.bpePairs(d, "text", topK = 2)
    val r = q.collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, "ab", 3L), (2L, "ba", 1L))) // ba < cd tie
    // the same distributed top-k contract as vocab
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("quantileDrift: per-quantile gaps; one-sided slice → NULL " +
      "quantiles; empty input → zero rows") {
    val schema = StructType(Seq(StructField("v", DoubleType),
      StructField("id", LongType)))
    def mk(rows: (java.lang.Double, Long)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2)).asJava, schema)
    // slice 0: 0..10 (even ids), slice 1: 100..110 (odd ids)
    val d = mk((0 to 10).flatMap(i => Seq(
      (java.lang.Double.valueOf(i.toDouble), 2L * i),
      (java.lang.Double.valueOf(100.0 + i), 2L * i + 1))): _*)
    val r = graft.ops.Drift.quantileDrift(d, "v", col("v"),
      pmod(col("id"), lit(2L))).collect()
    assert(r.length == 5)
    val med = r.find(_.getAs[Double]("p") == 0.5).get
    assert(med.getAs[Double]("q_a") == 5.0)
    assert(med.getAs[Double]("q_b") == 105.0)
    assert(med.getAs[Double]("gap") == 100.0)
    // one-sided: slice 1 empty → q_b/gap NULL, q_a defined
    val oneSided = mk((0 to 4).map(i =>
      (java.lang.Double.valueOf(i.toDouble), 2L * i)): _*)
    val r1 = graft.ops.Drift.quantileDrift(oneSided, "v", col("v"),
      pmod(col("id"), lit(2L))).collect()
    assert(r1.length == 5 && r1.forall(_.isNullAt(3)))
    assert(graft.ops.Drift.quantileDrift(mk(), "v", col("v"),
      pmod(col("id"), lit(2L))).collect().isEmpty)
  }

  test("embeddingDrift: identical slices → l2 0 and cosine 1; " +
      "shifted slice measured") {
    val vecSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    def mk(rows: (Long, Seq[Double])*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2)).asJava, vecSchema)
    val same = mk(0L -> Seq(1.0, 2.0), 1L -> Seq(1.0, 2.0),
      2L -> Seq(1.0, 2.0), 3L -> Seq(1.0, 2.0))
    val r0 = graft.ops.Drift.embeddingDrift(same, "e",
      col("embedding"), pmod(col("vec_id"), lit(2L)), dims = 2)
      .collect()(0)
    assert(r0.getAs[Long]("n_a") == 2L && r0.getAs[Long]("n_b") == 2L)
    assert(r0.getAs[Double]("l2") == 0.0)
    assert(r0.getAs[Double]("centroid_cos") == 1.0)
    val moved = mk(0L -> Seq(1.0, 0.0), 2L -> Seq(1.0, 0.0),
      1L -> Seq(0.0, 3.0), 3L -> Seq(0.0, 3.0))
    val r1 = graft.ops.Drift.embeddingDrift(moved, "e",
      col("embedding"), pmod(col("vec_id"), lit(2L)), dims = 2)
      .collect()(0)
    // centroids (1,0) vs (0,3): l2 = sqrt(10), cos = 0, gap = 3
    assert(math.abs(r1.getAs[Double]("l2") - math.sqrt(10.0)) < 1e-4)
    assert(r1.getAs[Double]("centroid_cos") == 0.0)
    assert(r1.getAs[Double]("max_dim_gap") == 3.0)
    // empty input → zero rows, not a NULL row
    assert(graft.ops.Drift.embeddingDrift(mk(), "e",
      col("embedding"), pmod(col("vec_id"), lit(2L)), dims = 2)
      .collect().isEmpty)
  }

  // ---------------------------------------------------------------
  // product quantization
  // ---------------------------------------------------------------

  test("pqCodes: per-subspace nearest sub-centroid, mse over dim") {
    val vecSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val d = spark.createDataFrame(Seq(
      Row(0L, Seq(0.0, 0.0, 10.0, 10.0)), // codebook row 0
      Row(1L, Seq(5.0, 5.0, 0.0, 0.0)),   // codebook row 1
      Row(5L, Seq(1.0, 1.0, 9.0, 9.0)),   // → codes [0, 0]
      Row(6L, Seq(4.0, 4.0, 1.0, 1.0))    // → codes [1, 1]
    ).asJava, vecSchema)
    val r = graft.ops.VectorQuant
      .pqCodes(d, "vec_id", "embedding", 0L, 2L, dim = 4, m = 2)
      .collect()
      .map(x => x.getLong(0) ->
        (x.getSeq[Long](1).toSeq, x.getDouble(2))).toMap
    assert(r(0L) == (Seq(0L, 0L), 0.0)) // codebook rows code to themselves
    assert(r(1L) == (Seq(1L, 1L), 0.0))
    assert(r(5L) == (Seq(0L, 0L), 1.0)) // d2 = 2 per subspace, /4
    assert(r(6L) == (Seq(1L, 1L), 1.0))
  }

  // ---------------------------------------------------------------
  // temperature quotas
  // ---------------------------------------------------------------

  test("temperatureQuotas: invT=0.5 up-samples the tail, invT=1 is " +
      "proportional") {
    val d = docs((0L until 90L).map(i => i -> "x"): _*)
      .withColumn("lang", when(col("doc_id") < 81L, "en").otherwise("de"))
    // n_en=81, n_de=9 → sqrt: 9 vs 3 → shares 0.75/0.25
    val r = graft.ops.Sampling
      .temperatureQuotas(d, "lang", budget = 100L, invT = 0.5)
      .collect().map(x => (x.getString(0), x.getLong(1),
        x.getAs[Double]("share"), x.getAs[Long]("quota"))).toSeq
    assert(r == Seq(("de", 9L, 0.25, 25L), ("en", 81L, 0.75, 75L)))
    val r1 = graft.ops.Sampling
      .temperatureQuotas(d, "lang", budget = 100L, invT = 1.0)
      .collect().map(x => (x.getString(0), x.getAs[Long]("quota"))).toSeq
    assert(r1 == Seq(("de", 10L), ("en", 90L)))
  }

  // ---------------------------------------------------------------
  // n-gram novelty
  // ---------------------------------------------------------------

  test("noveltyStats: share of eval grams unseen in training") {
    val train = docs(0L -> "a b c d") // grams: "a b c", "b c d"
    val eval = docs(
      10L -> "a b c x", // "a b c" seen, "b c x" novel → 0.5
      11L -> "p q r",   // fully novel
      12L -> "z z")     // < 3 tokens → no gram set, absent
    val r = Dedup.noveltyStats(train, eval, "doc_id", "text", n = 3)
      .collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getDouble(3))).toSeq ==
      Seq((10L, 2L, 1L, 0.5), (11L, 1L, 0L, 1.0)))
  }

  // ---------------------------------------------------------------
  // DSIR importance weighting
  // ---------------------------------------------------------------

  test("dsir: log-likelihood-ratio weights favor target-like docs") {
    val srcSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("src", StringType)))
    val d = spark.createDataFrame(Seq(
      Row(0L, "a a b", "tgt"), // target: a-heavy with b
      Row(1L, "a a", "raw"),   // raw, target-like
      Row(2L, "c c c", "raw")  // raw, source-only tokens
    ).asJava, srcSchema)
    val q = graft.ops.Dsir.topByImportance(d, "doc_id", "text",
      col("src") === "tgt", topK = 2)
    val r = q.collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
      == Seq((1L, 1L, 2L), (2L, 2L, 3L)))
    // selection head is a distributed partial top-k, never a
    // full-corpus rank window
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    // hand-derived: vocab {a,b,c}, na=3, nb=5, k=3;
    // lr(a) = ln((2.5/4.5)/(2.5/6.5)) = ln(6.5/4.5); doc 1 = 2·lr(a)
    val w1 = 2.0 * math.log(6.5 / 4.5)
    assert(math.abs(r(0).getAs[Double]("w") - w1) < 1e-4)
    assert(r(1).getAs[Double]("w") < 0.0) // source-only tokens ⇒ down-weighted
  }

  // ---------------------------------------------------------------
  // WAV decode: data-before-fmt chunk order
  // ---------------------------------------------------------------

  test("decodeSamples: spec-valid RIFF with data chunk before fmt " +
      "still decodes") {
    def le32b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val samples = le16b(1000) ++ le16b(-2000 & 0xffff)
    val dataChunk = "data".getBytes("ASCII") ++ le32b(4) ++ samples
    val fmtBody = le16b(1) ++ le16b(1) ++ le32b(8000) ++ le32b(16000) ++
      le16b(2) ++ le16b(16)
    val fmtChunk = "fmt ".getBytes("ASCII") ++ le32b(16) ++ fmtBody
    val riff = "RIFF".getBytes("ASCII") ++
      le32b(4 + dataChunk.length + fmtChunk.length) ++
      "WAVE".getBytes("ASCII") ++ dataChunk ++ fmtChunk
    assert(graft.ops.Multimodal.decodeSamples(riff)
      .map(_.toSeq).contains(Seq(1000, -2000)))
    // and fmt-before-data (the common layout) still decodes too
    val riff2 = "RIFF".getBytes("ASCII") ++
      le32b(4 + dataChunk.length + fmtChunk.length) ++
      "WAVE".getBytes("ASCII") ++ fmtChunk ++ dataChunk
    assert(graft.ops.Multimodal.decodeSamples(riff2)
      .map(_.toSeq).contains(Seq(1000, -2000)))
  }
}
