package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling}

/** Round-9 additions: the quotaSampleByHash property sweep (frac ×
  * skew × buckets vs the windowed reference), its NULL-stratum
  * contract, the plan-shape assert, and the persisted catalog-index
  * build-params metadata. */
class Round9Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val sql = spark

  private object TextStatsAccess {
    def boilerplate(df: DataFrame): DataFrame =
      graft.ops.TextStats.boilerplateGrams(df, "doc_id", "text",
        n = 3, topK = 20)
  }

  // 90/10-skewed stratified fixture: stratum "big" holds 90% of the
  // rows, "a"/"b" split the rest; `nullFrom` rows get a NULL stratum
  private def skewed(n: Long, withNull: Boolean): DataFrame = {
    val big = (n * 9) / 10
    val base = spark.range(n).select(col("id"),
      when(col("id") < big, lit("big"))
        .when(col("id") % 2 === 0, lit("a"))
        .otherwise(lit("b")).as("lang"))
    if (!withNull) base
    else base.withColumn("lang",
      when(col("id") % 13 === 5, lit(null: String))
        .otherwise(col("lang")))
  }

  /** The windowed reference selection quotaSampleByHash must equal:
    * per stratum, the ceil(frac·n) smallest rows under the
    * (minstd bucket, id) ordering — one window expression, the same
    * form the DuckDB oracle states. */
  private def windowedRef(df: DataFrame, frac: Double, buckets: Int)
      : Set[(String, Long)] = {
    val b = pmod(Sampling.minstdHash(col("id")), lit(buckets.toLong))
    val w = Window.partitionBy("lang").orderBy(b, col("id"))
    val wc = Window.partitionBy("lang")
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .where(col("__rn") <=
        ceil(col("__cnt").cast("double") * lit(frac)).cast("long"))
      .select("lang", "id").collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getLong(1))).toSet
  }

  test("quotaSampleByHash sweep: frac × skew × buckets equals the " +
      "windowed reference with exact per-stratum quotas") {
    val df = skewed(2000L, withNull = false)
    val counts = df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // frac 1.0 (boundary = last bucket), 0.5, and a quota-of-1 tail;
    // buckets down to 1 (residual = the ENTIRE stratum) and 2
    // (pathologically large residual slices)
    for (frac <- Seq(1.0, 0.5, 1e-6); buckets <- Seq(1, 2, 7, 1000)) {
      val got = Sampling.stratifiedHashExact(df, "lang", "id", frac,
          buckets)
        .select("lang", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val ref = windowedRef(df, frac, buckets)
      assert(got == ref,
        s"frac=$frac buckets=$buckets: hash selection != windowed " +
          s"reference (${got.size} vs ${ref.size} rows)")
      val perStratum = got.groupBy(_._1).map { case (k, v) =>
        k -> v.size.toLong }
      counts.foreach { case (lang, n) =>
        val want = math.ceil(n.toDouble * frac).toLong
        assert(perStratum.getOrElse(lang, 0L) == want,
          s"frac=$frac buckets=$buckets stratum=$lang: quota " +
            s"${perStratum.getOrElse(lang, 0L)} != ceil(frac*n)=$want")
      }
    }
  }

  test("quotaSampleByHash keeps a NULL stratum like the window " +
      "form's PARTITION BY (null-safe stratum joins)") {
    val df = skewed(1300L, withNull = true)
    val nNull = df.where(col("lang").isNull).count()
    assert(nNull > 0, "fixture must have a NULL stratum")
    for (frac <- Seq(0.3, 1.0)) {
      val got = Sampling.stratifiedHashExact(df, "lang", "id", frac, 7)
        .select("lang", "id").collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0),
          r.getLong(1))).toSet
      assert(got == windowedRef(df, frac, 7),
        s"frac=$frac: NULL-stratum selection diverged from the " +
          "windowed reference")
      val gotNull = got.count(_._1 == null).toLong
      assert(gotNull == math.ceil(nNull.toDouble * frac).toLong,
        s"frac=$frac: NULL stratum kept $gotNull of $nNull")
    }
  }

  test("quotaSampleByHash plan: the only ranking window is the " +
      "bounded residual slice — no corpus sort") {
    val out = Sampling.stratifiedHashExact(
      skewed(500L, withNull = false), "lang", "id", 0.25, 7)
    val plan = out.queryExecution.executedPlan.toString
    // the only ROW-RANKING window is the residual slice's: exactly
    // one row_number in the plan, and the boundary-bucket filter
    // (__b = __tb) is present to bound it to ~n/buckets rows. The
    // remaining Window nodes are the histogram cum-sum (partitions
    // ≤ buckets rows; it prints once per Union branch through the
    // shared broadcast subtree). A second row_number would mean the
    // map-only core admission regressed to a ranking.
    val ranks = "row_number".r.findAllIn(plan).size
    assert(ranks == 1,
      s"expected 1 residual row_number, found $ranks in:\n$plan")
    assert(plan.contains("__tb"),
      "residual ranking must run on the boundary-bucket slice")
    val windows = "\\bWindow ".r.findAllIn(plan).size
    assert(windows <= 3,
      s"unexpected extra Window nodes ($windows):\n$plan")
  }

  // ---------------------------------------------------------------
  // Catalog index metadata: persisted build params
  // ---------------------------------------------------------------

  private val docSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))
  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava,
      docSchema)

  // ---------------------------------------------------------------
  // Learned PQ codebooks: Lloyd training reduces quantization error
  // ---------------------------------------------------------------

  test("pqCodes: a Lloyd-trained codebook (iters=2) reduces mean " +
      "reconstruction error vs the seeded codebook (iters=1)") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 2000L)
    def meanMse(iters: Int): Double =
      graft.ops.VectorQuant.pqCodes(emb, "vec_id", "embedding",
          seedLo = 120L, seedHi = 152L, dim = 64, m = 8, iters = iters)
        .agg(avg("mse")).collect()(0).getDouble(0)
    val seeded = meanMse(1)
    val trained = meanMse(2)
    assert(trained < seeded,
      s"training must reduce quantization error: $trained vs $seeded")
    // the k-means step is a strict improvement on this data, not noise
    assert(trained < seeded * 0.9,
      s"expected a material drop, got $trained vs $seeded")
  }

  test("pqAdcTopK trained path returns a full ranking per query " +
      "with codes-only scoring") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.ops.VectorQuant.pqAdcTopK(emb, "vec_id",
      "embedding", seedLo = 120L, seedHi = 152L, numQueries = 5,
      k = 10, dim = 64, m = 8, iters = 2).collect()
    assert(out.length == 50, s"expected 5 queries x 10, got ${out.length}")
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 5 && byQ.values.forall(_.length == 10))
    byQ.values.foreach { rows =>
      val ds = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted),
        "ADC distances must rank ascending")
    }
  }

  // ---------------------------------------------------------------
  // Boilerplate grams: bounded head, no pre-limit ranking window
  // ---------------------------------------------------------------

  test("boilerplateGrams heads through TakeOrderedAndProject and " +
      "counts document frequency, not term frequency") {
    import sql.implicits._
    val docs = Seq(
      (1L, "the same header line alpha"),
      (2L, "the same header line beta"),
      (3L, "the same header the same header"), // gram repeats in-doc
      (4L, "unrelated text entirely here")).toDF("doc_id", "text")
    val out = TextStatsAccess.boilerplate(docs)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k head must be a bounded TakeOrderedAndProject:\n$plan")
    val rows = out.collect()
    val bySig = rows.map(r => r.getString(1) -> r.getLong(2)).toMap
    // doc 3 contains "the same header" twice but counts ONCE
    assert(bySig("the same header") == 3L,
      s"document frequency must dedup within doc: $bySig")
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
  }

  // ---------------------------------------------------------------
  // Margin mining: hubness correction + window-free neighbor stats
  // ---------------------------------------------------------------

  test("marginMine: ratio margin demotes a hub target below a true " +
      "pair of equal raw prominence; heaps are window-free") {
    import sql.implicits._
    // x0=[1,0], x1=[0,1]; hub=[0.8,0.6] is close to BOTH x's, y1=[1,0]
    // is x0's true pair. Raw cosine ranks (x0,y1)=1.0 then
    // (x0,hub)=0.8; the margin keeps that order but discounts the
    // hub relative to its raw cosine (0.889 < 0.8/0.72 without the
    // y-side mean), and the true pair scores the maximal margin.
    val xs = Seq((0L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val ys = Seq((1L, Array(0.8f, 0.6f)), (3L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.marginMine(xs, ys, "vec_id",
      "embedding", dim = 2, k = 1, topM = 4)
    val plan = out.queryExecution.executedPlan.toString
    // the ONLY window is the post-limit rank over <= topM rows; the
    // k-NN means run through the bounded TopKByScore heaps
    assert("\\bWindow ".r.findAllIn(plan).size == 1, plan)
    val rows = out.collect()
    assert(rows.head.getLong(1) == 0L && rows.head.getLong(2) == 3L,
      s"true pair must rank first: ${rows.toSeq}")
    val byPair = rows.map(r =>
      (r.getLong(1), r.getLong(2)) -> r.getDouble(4)).toMap
    assert(byPair((0L, 3L)) == 1.0) // cos 1 / mean-NN 1
    // hub pair margin strictly below its raw cosine share
    assert(byPair((0L, 1L)) < 0.9 && byPair((0L, 1L)) > 0.85)
  }

  // ---------------------------------------------------------------
  // k-means convergence contract: inertia is non-increasing
  // ---------------------------------------------------------------

  test("kmeansConvergence: inertia non-increasing across iterations, " +
      "shift NULL only on round 1") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = graft.ops.KMeansOp.kmeansConvergence(emb, "vec_id",
        "embedding", seedLo = 120L, seedHi = 136L, iters = 4)
      .collect()
    assert(rows.length == 4)
    val inertias = rows.map(_.getDouble(2))
    inertias.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"Lloyd inertia must not increase: $a -> $b")
    }
    assert(rows.head.isNullAt(3), "round 1 has no previous codebook")
    rows.tail.foreach { r =>
      assert(!r.isNullAt(3) && r.getDouble(3) >= 0.0)
    }
  }

  test("appendCatalogIndex rejects params that mismatch the " +
      "persisted build params") {
    val day0 = docs((0L, (1 to 20).map(i => s"tok$i").mkString(" ")))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_catidx_meta").toString
    Dedup.writeCatalogIndex(day0, "doc_id", "text", dir,
      n = 3, numHashes = 64, bands = 16)
    val (n, nh, b, maxDf, hot) = Dedup.readCatalogMeta(spark, dir)
    assert((n, nh, b, maxDf, hot) == (3, 64, 16, None, Nil))
    val day1 = docs((1L, (5 to 25).map(i => s"tok$i").mkString(" ")))
    val e = intercept[IllegalArgumentException] {
      Dedup.appendCatalogIndex(day1, "doc_id", "text", dir,
        n = 3, numHashes = 64, bands = 8)
    }
    assert(e.getMessage.contains("persisted build params"))
  }

  test("appendCatalogIndex reuses the persisted hot-shingle set: " +
      "appended signatures equal a rebuild under the frozen hot set") {
    val boiler = (1 to 10).map(i => s"hot$i").mkString(" ")
    // the boilerplate phrase appears in 6 docs -> its shingles have
    // df 6 > cap 4 and land in the persisted hot set
    val day0 = docs((0L until 6L).map(i =>
      i -> (boiler + s" tail$i a$i b$i c$i")) :+
      (50L -> (20 to 35).map(i => s"cold$i").mkString(" ")): _*)
    val day1 = docs((100L, boiler + " tailX aX bX cX"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_catidx_hot").toString
    Dedup.writeCatalogIndex(day0, "doc_id", "text", dir,
      n = 3, numHashes = 64, bands = 16, maxDf = Some(4L))
    val (_, _, _, maxDf, hot) = Dedup.readCatalogMeta(spark, dir)
    assert(maxDf.contains(4L) && hot.nonEmpty,
      "hot shingle set must be persisted with the index")
    Dedup.appendCatalogIndex(day1, "doc_id", "text", dir,
      n = 3, numHashes = 64, bands = 16)
    val sigs = spark.read.parquet(s"$dir/signatures")
    val rebuilt = Dedup.minhashSignaturesStatic(
      day0.unionByName(day1), "doc_id", "text", n = 3,
      numHashes = 64, hot = hot)
    assert(sigs.orderBy("id").collect().toSeq ==
      rebuilt.orderBy("id").collect().toSeq,
      "append under the persisted hot set must equal a frozen-hot " +
        "rebuild")
  }

  // ---------------------------------------------------------------
  // Residual IVF-PQ (the full IVF-ADC shape)
  // ---------------------------------------------------------------

  /** Clustered vector fixture: 4 latent centers, vector i =
    * center(i % 4) + small deterministic noise — the regime where
    * residual encoding's fidelity gain exists (coarse cells absorb
    * the cluster structure, residuals are the small remainder). */
  private def clusteredVecs(n: Int, dim: Int, seed: Long,
      nCenters: Int = 4): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nCenters, dim)(rng.nextGaussian() * 5.0)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    spark.createDataFrame(
      (0 until n).map { i =>
        val c = centers(i % nCenters)
        Row(i.toLong,
          c.toSeq.map(_ + rng.nextGaussian() * 0.3))
      }.asJava, schema)
  }

  test("ivfPqResidualTopK: matches an independent residual " +
      "cells+LUT reconstruction and keeps a window-free tail") {
    val vecs = clusteredVecs(60, 8, seed = 41L)
    val out = graft.ops.VectorQuant.ivfPqResidualTopK(vecs, "vec_id",
      "embedding", ivfLo = 10L, ivfHi = 14L, pqLo = 14L, pqHi = 18L,
      numQueries = 3, k = 5, nprobe = 2, dim = 8, m = 2)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "residual IVF-PQ ranking tail must be window-free")
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val data = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def sub(a: Array[Double], s: Int) = a.slice(s * 4, s * 4 + 4)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // coarse cells: rounded |c|²−2·v·c, cid tie-break (seeded)
    def cellRank(v: Array[Double]) =
      (10L until 14L).map { cid =>
        val c = data(cid)
        (graft.det.Sig.sig5(dot(c, c) - 2.0 * dot(v, c)), cid)
      }.sortBy(identity).map(_._2)
    val assign = data.view.mapValues(v => cellRank(v).head).toMap
    // residual of every vector vs ITS cell's centroid
    val resid = data.map { case (vid, v) =>
      vid -> v.zip(data(assign(vid))).map { case (x, c) => x - c }
    }
    // PQ sub-centroids = residuals of the seed rows [14, 18)
    def codesOf(r: Array[Double]) = (0 until 2).map { s =>
      (14L until 18L).map { cid =>
        val cs = sub(resid(cid), s)
        val xs = sub(r, s)
        (graft.det.Sig.sig5(dot(cs, cs) - 2.0 * dot(xs, cs) +
          dot(xs, xs)), cid)
      }.min._2
    }
    val expected = (0L until 3L).flatMap { qid =>
      val probes = cellRank(data(qid)).take(2).toSet
      val ranked = data.keys
        .filter(vid => vid != qid && probes.contains(assign(vid)))
        .toSeq.map { vid =>
          // the query's residual vs the CANDIDATE's cell, scored
          // against the shared residual codebook
          val qr = data(qid).zip(data(assign(vid)))
            .map { case (x, c) => x - c }
          val dist = (0 until 2).map { s =>
            d2(sub(qr, s), sub(resid(codesOf(resid(vid))(s)), s))
          }.sum
          (graft.det.Sig.sig5(dist), vid)
        }.sortBy(identity).take(5)
      ranked.zipWithIndex.map { case ((d, vid), i) =>
        (qid, i + 1L, vid, d)
      }
    }
    assert(got.toSeq == expected,
      s"residual IVF-PQ mismatch:\n got ${got.toSeq}\n exp $expected")
  }

  test("residual encoding beats raw-vector PQ on reconstruction " +
      "error when the coarse quantizer absorbs cluster structure") {
    // 8 latent clusters but only 4 PQ codes per subspace: raw PQ
    // cannot cover the cluster locations, residual PQ only has to
    // cover the noise ball the coarse quantizer leaves behind
    val vecs = clusteredVecs(80, 8, seed = 43L, nCenters = 8)
    val data = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cellOf(v: Array[Double]) =
      (8L until 16L).map { cid =>
        val c = data(cid)
        (graft.det.Sig.sig5(dot(c, c) - 2.0 * dot(v, c)), cid)
      }.min._2
    // residual frame built independently of the operator under test
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val resDf = spark.createDataFrame(
      data.toSeq.sortBy(_._1).map { case (vid, v) =>
        Row(vid, v.zip(data(cellOf(v)))
          .map { case (x, c) => x - c }.toSeq)
      }.asJava, schema)
    def avgMse(df: DataFrame): Double = {
      val rows = graft.ops.VectorQuant.pqCodes(df, "vec_id",
          "embedding", 16L, 20L, dim = 8, m = 2, iters = 2)
        .select(avg("mse")).collect()
      rows(0).getDouble(0)
    }
    val rawMse = avgMse(vecs)
    val resMse = avgMse(resDf)
    assert(resMse < rawMse * 0.5,
      s"residual mse $resMse should be well under raw mse $rawMse")
  }
}
