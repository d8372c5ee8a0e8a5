package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, KMeansOp}

/** Dev utility: end-to-end near-dup dedup over a GENERATED corpus with
  * an adversarial hot cluster, measuring the star-cap degradation the
  * unit tests only assert structurally. Usage:
  * `graft.DedupScaleSmoke [docs] [hot] [cap]` (defaults 10M / 100k /
  * 1000).
  *
  * Corpus shape (all closed-form expressions — no data files, no RNG
  * at runtime):
  *  - ids [0, hot): ONE viral boilerplate cluster — 11 shared tokens
  *    + 1 unique trailing token per doc (pairwise n-gram Jaccard
  *    9/11 ≈ 0.82). Every doc shares every band hash → uncapped LSH
  *    would emit C(hot, 2) candidate pairs (5e9 at the default);
  *    `maxBucket` must degrade it to hot−1 star edges per band.
  *  - ids [hot, 10·hot): near-dup GROUPS of 4 (11 cluster-shared
  *    tokens + unique trailing token) — the realistic duplication the
  *    operator must still find exactly.
  *  - the rest: fully unique 12-token docs (singleton buckets).
  *
  * Phases measured: MinHash signatures + banding, bucket-cap profile,
  * capped candidate pairs, connected components, and the SemDeDup
  * maxCluster cap over a generated embedding corpus with the same hot
  * blob (100k identical vectors in one cell). Wall times + cap
  * counters print as one summary block for BASELINE.md. */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val docs = if (args.length > 0) args(0).toLong else 10000000L
    val hot = if (args.length > 1) args(1).toLong else 100000L
    val cap = if (args.length > 2) args(2).toLong else 1000L
    require(hot * 10 <= docs, "need docs >= 10*hot")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tok(e: org.apache.spark.sql.Column) =
      concat(lit("w"), e.cast("string"))
    val V = 100000000L // token-id offsets keeping the regions disjoint
    // floor division: Column./ is DOUBLE division, which would give
    // every doc a distinct "group" and silently remove the near-dup
    // structure this smoke exists to measure
    val grp = floor((col("id") - hot) / 4L).cast("long")
    val hotText = concat_ws(" ",
      ((0 until 11).map(i => lit(s"hot$i")) :+ tok(col("id"))): _*)
    val groupText = concat_ws(" ",
      ((0 until 11).map(i => tok(grp * 11L + i + V)) :+
        tok(col("id") + 2L * V)): _*)
    val uniqText = concat_ws(" ",
      (0 until 12).map(i => tok(col("id") * 12L + i + 3L * V)): _*)
    val corpus = spark.range(docs).select(col("id"),
      when(col("id") < hot, hotText)
        .when(col("id") < hot * 10L, groupText)
        .otherwise(uniqText).as("text"))

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // optional phase filter (args(3), CSV of
    // profile|pairs|incremental|semantic) so one phase can be
    // re-measured without paying the others
    val phases: Set[String] =
      if (args.length > 3) args(3).split(",").toSet
      else Set("profile", "pairs", "incremental", "semantic")

    // bucket-cap profile over the exact banded frame the join sees
    if (phases("profile")) {
      val profile = timed("bucket profile (signatures + banding + agg)") {
        val sigs = Dedup.minhashSignatures(corpus, "id", "text",
          n = 3, numHashes = 64)
        Dedup.bucketCapProfile(
          Dedup.bandedFromSignatures(sigs, 64, 16), cap).collect().head
      }
      println(s"[dedup-smoke] buckets=${profile.getLong(0)} " +
        s"over_cap=${profile.getLong(1)} " +
        s"allpairs_edges=${profile.getLong(2)} " +
        s"star_edges=${profile.getLong(3)} " +
        s"avoided_edges=${profile.getLong(4)} " +
        s"max_bucket=${profile.getLong(5)}")
    }

    if (phases("pairs")) {
    val pairs = timed("capped LSH candidate pairs (end-to-end)") {
      Dedup.minhashLshPairs(corpus, "id", "text", n = 3,
        numHashes = 64, bands = 16, minEstJaccard = 0.5,
        maxBucket = Some(cap))
        .transform(graft.ops.Materialize.materialize)
    }
    val nPairs = pairs.count()
    println(s"[dedup-smoke] candidate pairs = $nPairs (uncapped hot " +
      s"cluster alone would be ${hot * (hot - 1) / 2})")

    val clusters = timed("connected components (large/small-star)") {
      Dedup.duplicateClustersStar(pairs,
        driverThreshold = 100000L)
        .transform(graft.ops.Materialize.materialize)
    }
    val summary = clusters.agg(
      countDistinct(col("cluster_id")).as("n_clusters"),
      count(lit(1)).as("n_docs_in_clusters")).collect().head
    println(s"[dedup-smoke] clusters=${summary.getLong(0)} " +
      s"docs_in_clusters=${summary.getLong(1)} " +
      s"(expected: 1 hot cluster of $hot + ${hot * 10 - hot} group docs " +
      s"in ${(hot * 10 - hot) / 4} groups)")
    }

    if (phases("incremental")) {
    // incremental (catalog) dedup at scale: 99% of the corpus is the
    // persisted catalog (index built ONCE per corpus version), the 1%
    // id-sampled slice arrives as today's batch and probes the
    // prebuilt index — the measured daily cost vs full re-pairing
    val isIncoming = pmod(col("id"), lit(100L)) === 0L
    val incoming = corpus.where(isIncoming)
    val catalogDocs = corpus.where(!isIncoming)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_smoke_catidx").toString
    timed("catalog index build+persist (99% of corpus, once)") {
      Dedup.writeCatalogIndex(catalogDocs, "id", "text", idxDir,
        n = 3, numHashes = 64, bands = 16)
    }
    val (catSigs, catBands) = Dedup.readCatalogIndex(spark, idxDir)
    val incPairs = timed("incremental probe (1% batch vs index)") {
      Dedup.incrementalLshPairsWithIndex(incoming, catSigs, catBands,
        "id", "text", n = 3, numHashes = 64, bands = 16,
        minEstJaccard = 0.5, maxCatalogPerBucket = Some(cap))
        .transform(graft.ops.Materialize.materialize)
    }
    println(s"[dedup-smoke] incremental pairs = ${incPairs.count()} " +
      s"(batch = ${docs / 100} docs against a " +
      s"${docs - docs / 100}-doc catalog index)")

    // catalog maintenance: fold the accepted batch INTO the persisted
    // index (an O(batch) sign+band+append job) — the daily-lifecycle
    // alternative to the full index rebuild timed above
    timed("catalog index append (accepted 1% batch folded in)") {
      Dedup.appendCatalogIndex(incoming, "id", "text", idxDir,
        n = 3, numHashes = 64, bands = 16)
    }
    val merged = Dedup.readCatalogIndex(spark, idxDir)._2.count()
    println(s"[dedup-smoke] merged index bands = $merged rows")
    }

    if (phases("semantic")) {
    // SemDeDup maxCluster cap: same hot blob in embedding space —
    // 100k identical vectors land in one Voronoi cell; the cap must
    // bound within-cell pair emission
    val dim = 8
    val emb = spark.range(docs).select(col("id").as("vec_id"),
      when(col("id") < hot,
        array((0 until dim).map(i => lit((i + 1).toDouble)): _*))
        .otherwise(array((0 until dim).map(i =>
          sin(col("id") * (i + 1.0))): _*)).as("embedding"))
    val semPairs = timed(s"SemDeDup capped pairs ($docs vectors)") {
      KMeansOp.semanticDupPairs(emb, "vec_id", "embedding",
        seedLo = hot, seedHi = hot + 16L, dim = dim,
        minCosine = 0.99, maxCluster = Some(cap))
        .transform(graft.ops.Materialize.materialize)
    }
    val nSem = semPairs.count()
    val hotSem = semPairs
      .where(col("id_a") < hot && col("id_b") < hot).count()
    println(s"[dedup-smoke] semantic pairs = $nSem " +
      s"(hot-blob pairs = $hotSem; uncapped blob would be " +
      s"${hot * (hot - 1) / 2})")
    }
    spark.stop()
  }
}
