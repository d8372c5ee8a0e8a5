package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops._
import graft.pipeline.CorpusPipeline

/** Dedup-family queries (exact / n-gram / MinHash / SimHash / fuzzy / semantic / incremental). Split from the monolithic Extensions
  * registry (round 11) — pure move, zero behavior; every
  * query keeps its DuckDB oracle. */
object DedupQueries {

  import Shared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactStats(t(s, dir, "documents"), Seq("text"))),
    "dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDf = Some(NgramMaxDf))),
    // the PRODUCTION near-dup pair plan (r14): MinHash-banded
    // candidates, exact Jaccard verified on candidates only — linear
    // where dedup_ngram is Θ(Σdf²); SAME oracle (values match the
    // exact plan wherever banding recall is 1, which the fixtures pin)
    "dedup_ngram_banded" -> ((s, dir) =>
      Dedup.minhashVerifiedPairs(t(s, dir, "documents"), "doc_id",
        "text", n = 3, minJaccard = 0.5, maxDf = Some(NgramMaxDf))),
    // LANGUAGE-blocked near-dup: candidates generated only within a
    // block (the block rides the shingle-join key, df cap per block)
    // — the crawl-dedup partition; the oracle replays the blocked
    // join, so cross-block pair suppression must be exact
    "dedup_ngram_blocked" -> ((s, dir) =>
      Dedup.ngramJaccardPairsBlocked(t(s, dir, "documents"), "doc_id",
        "text", "lang", n = 3, minJaccard = 0.5,
        maxDf = Some(NgramMaxDf))),
    // PASSAGE-level near-dup (the RAG-corpus gate doc-level dedup
    // misses): the chunker's 64/48 windows near-dup'd by the exact
    // n-gram machinery; chunk identity = doc_id·1e9 + chunk_idx
    // (wide enough that no realistic document — <~48M tokens at
    // size=64/stride=48 — can alias across documents), decoded back
    // in the output
    "chunk_dedup" -> ((s, dir) => {
      val ch = Chunking.chunkTokens(t(s, dir, "documents"), "doc_id",
          "text", size = 64, stride = 48)
        .select((col("doc_id") * 1000000000L + col("chunk_idx"))
          .as("cid"), col("chunk_text"))
      Dedup.ngramJaccardPairs(ch, "cid", "chunk_text", n = 3,
          minJaccard = 0.8, maxDf = Some(NgramMaxDf))
        .select(expr("id_a div 1000000000").as("doc_a"),
          pmod(col("id_a"), lit(1000000000L)).as("chunk_a"),
          expr("id_b div 1000000000").as("doc_b"),
          pmod(col("id_b"), lit(1000000000L)).as("chunk_b"),
          col("jaccard"))
        .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b")
    }),
    // passage-level near-dup on the PRODUCTION pair plan — the banded
    // twin of chunk_dedup (chunks are the unit, so the candidate
    // volume the banding bounds is per-chunk); same oracle
    "chunk_dedup_banded" -> ((s, dir) => {
      val ch = Chunking.chunkTokens(t(s, dir, "documents"), "doc_id",
          "text", size = 64, stride = 48)
        .select((col("doc_id") * 1000000000L + col("chunk_idx"))
          .as("cid"), col("chunk_text"))
      Dedup.minhashVerifiedPairs(ch, "cid", "chunk_text", n = 3,
          minJaccard = 0.8, maxDf = Some(NgramMaxDf))
        .select(expr("id_a div 1000000000").as("doc_a"),
          pmod(col("id_a"), lit(1000000000L)).as("chunk_a"),
          expr("id_b div 1000000000").as("doc_b"),
          pmod(col("id_b"), lit(1000000000L)).as("chunk_b"),
          col("jaccard"))
        .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b")
    }),
    // asymmetric containment reuse: Jaccard is structurally blind to
    // short-in-long quotes, so the fixture synthesizes them
    // deterministically (the null_association precedent): every 17th
    // doc contributes its 15-token prefix as a pseudo-quote doc
    // (id + 1,000,000) — contained ≈1.0 in its parent while their
    // Jaccard stays far below any dedup threshold
    "dedup_containment" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val quotes = base
        .where(col("doc_id") % 17 === 0 && size(w) >= 15)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(w, 1, 15), " ").as("text"))
      Dedup.containmentPairs(base.unionByName(quotes), "doc_id",
        "text", n = 3, minContain = 0.9, maxDf = Some(NgramMaxDf))
    }),
    // containment on the PRODUCTION paths: short docs probe the gram
    // index (any length ratio), similar-length containment rides the
    // banded near-dup arm; mid-ratio partial containment is the
    // substring family's job by declaration. Same fixture, same oracle
    "dedup_containment_routed" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val quotes = base
        .where(col("doc_id") % 17 === 0 && size(w) >= 15)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(w, 1, 15), " ").as("text"))
      Dedup.containmentPairsRouted(base.unionByName(quotes), "doc_id",
        "text", n = 3, minContain = 0.9, maxDf = Some(NgramMaxDf))
    }),
    // near-dup cluster-size distribution — the release-report view
    // of the cluster frame ("how much of the corpus sits in 2-doc vs
    // 50-doc duplicate families"); same canonical docClusters
    // construction, two tiny aggregations on top
    "dedup_cluster_stats" -> ((s, dir) =>
      docClusters(s, dir)
        .groupBy("cluster_id").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"),
          sum("size").as("n_docs"))
        .orderBy("size")),
    // block-then-verify fuzzy dedup: shingle-Jaccard blocking at 0.3,
    // Levenshtein verify at ≤ 5% of the longer text
    "dedup_fuzzy" -> ((s, dir) =>
      Dedup.fuzzyPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, blockJaccard = 0.3, maxNormDist = 0.05,
        maxDf = Some(NgramMaxDf))),
    // fuzzy dedup on the PRODUCTION blocking path: banded MinHash
    // candidates at the block threshold, same Levenshtein verify,
    // same oracle
    "dedup_fuzzy_banded" -> ((s, dir) =>
      Dedup.fuzzyPairsBanded(t(s, dir, "documents"), "doc_id", "text",
        n = 3, blockJaccard = 0.3, maxNormDist = 0.05,
        maxDf = Some(NgramMaxDf))),
    // recall containment: exact J≥0.8 pairs ∩ MinHash-LSH candidates;
    // oracle = the exact pairs, so a hash-match proves 100% recall.
    // The premise threshold is 0.8 (not the 0.7 operating point) so
    // the gate is robust to fixture drift: with 16 bands × 4 rows the
    // per-pair capture probability at exactly J=0.8 is 1−(1−0.8⁴)¹⁶ ≈
    // 0.99978 (vs ≈0.988 at J=0.7 — an unlucky exact pair at the
    // lower threshold would fail the gate ~1% of the time per pair
    // without any code regression)
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashContainmentPairs(t(s, dir, "documents"), "doc_id",
        "text", n = 3, numHashes = 64, bands = 16, minEstJaccard = 0.5,
        minJaccard = 0.8, maxDf = Some(NgramMaxDf))),
    // incremental (catalog) dedup — the daily-crawl shape: the src0
    // slice arrives as the new batch, everything else is the
    // persisted catalog; declared as the recall-containment gate
    // (exact cross-side J≥0.8 pairs ∩ incremental LSH candidates,
    // oracle = the exact pairs — fixture pairs sit at J 0.97–0.99
    // where 16×4 banding capture is ≈1)
    "dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalContainmentPairs(
        docs.where(col("source") === "src0"),
        docs.where(col("source") =!= "src0"),
        "doc_id", "text", n = 3, numHashes = 64, bands = 16,
        minEstJaccard = 0.5, minJaccard = 0.8,
        maxDf = Some(NgramMaxDf))
    }),
    // bounded-distance invariant: exact J≥0.9 pairs with SimHash
    // Hamming ≤ 16; oracle = the exact pairs
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashBoundedPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.9, maxHamming = 16,
        maxDf = Some(NgramMaxDf))),
    // the bounded-distance invariant on the PRODUCTION premise path:
    // banded MinHash pairs at J>=0.9 (capture >= 1-3e-8 per pair),
    // same Hamming bound, same oracle
    "dedup_simhash_banded" -> ((s, dir) =>
      Dedup.simhashBoundedPairsBanded(t(s, dir, "documents"), "doc_id",
        "text", n = 3, minJaccard = 0.9, maxHamming = 16,
        maxDf = Some(NgramMaxDf))),
    // pairwise candidates → dedup decision: connected components over
    // the capped exact pair graph (cluster id = min reachable doc id)
    // via the O(log n)-round large-star/small-star algorithm — the
    // any-diameter scale path (min-label propagation kept as the
    // cross-checked simple variant)
    "dedup_clusters" -> ((s, dir) => docClusters(s, dir)),
    // the banded production twin of dedup_clusters: same star
    // clustering over minhashVerifiedPairs candidates (star-capped
    // buckets preserve connectivity, so even an engaged cap keeps the
    // cluster frame identical); same exact-closure oracle
    "dedup_clusters_banded" -> ((s, dir) => bandedDocClusters(s, dir)),
    // end-to-end keep-one-representative stats over the SAME clusters
    // frame dedup_clusters declares (one construction site — the two
    // queries cannot drift; a real pipeline materializes the clusters
    // once, as CorpusPipeline does)
    "dedup_keep" -> ((s, dir) =>
      Dedup.keepStats(t(s, dir, "documents"), "doc_id",
        docClusters(s, dir))),
    // keep-one stats over the BANDED cluster frame — the production
    // end-to-end dedup decision; same oracle as dedup_keep
    "dedup_keep_banded" -> ((s, dir) =>
      Dedup.keepStats(t(s, dir, "documents"), "doc_id",
        bandedDocClusters(s, dir))),
    // the scale path IS the declared query: banded hyperplane LSH with
    // the oracle replicating the banding (plane literals in the SQL)
    "dedup_embed" -> ((s, dir) =>
      Dedup.embedCosinePairsBanded(t(s, dir, "embeddings"), "vec_id",
        "embedding", minCosine = 0.5, bands = EmbedBands,
        rowsPerBand = EmbedRows)),
    // daily-crawl semantic dedup: odd vec_ids are "today's batch",
    // probed against the frozen even-id index (IVF cells trained on
    // the index side only — the AnnIndex probe contract, stateless)
    "dedup_semantic_incremental" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.incrementalSemanticDups(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", centroidLo = 100L, centroidHi = 132L,
        nprobe = 2, minCosine = 0.4, iters = 2)
    }),
    // which SOURCE is internally duplicated (per-source dedup_exact)
    "dedup_exact_by_source" -> ((s, dir) =>
      Dedup.exactStatsBySource(t(s, dir, "documents"), "source",
        "text")),
    // dedup operating-point curve: how many pairs each candidate
    // Jaccard threshold would link — the number you pick τ from;
    // ONE unthresholded pair join, conditional sums per τ
    "dedup_threshold_curve" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, minJaccard = 0.0,
        maxDf = Some(NgramMaxDf))
      pairs.select(explode(typedLit(
          Seq(0.3, 0.5, 0.7, 0.8, 0.9))).as("threshold"),
          col("jaccard"))
        .groupBy("threshold")
        .agg(sum(when(col("jaccard") >= col("threshold"), 1L)
          .otherwise(0L)).as("n_pairs"))
        .orderBy("threshold")
    }),
    // the curve on the PRODUCTION pair plan: banded candidates
    // verified at the curve's lowest threshold (0.3), same
    // conditional sums, same oracle (identical counts wherever
    // banding recall is 1 at J>=0.3 — the shared gate pins it)
    "dedup_threshold_curve_banded" -> ((s, dir) => {
      val pairs = Dedup.minhashVerifiedPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, minJaccard = 0.3,
        maxDf = Some(NgramMaxDf))
      pairs.select(explode(typedLit(
          Seq(0.3, 0.5, 0.7, 0.8, 0.9))).as("threshold"),
          col("jaccard"))
        .groupBy("threshold")
        .agg(sum(when(col("jaccard") >= col("threshold"), 1L)
          .otherwise(0L)).as("n_pairs"))
        .orderBy("threshold")
    }),
    // substring-level duplication (Lee et al. suffix-array semantics,
    // n-gram-position-index shape)
    "dedup_substring" -> ((s, dir) =>
      SubstringDedup.duplicatedSpanStats(t(s, dir, "documents"),
        "doc_id", "text", gram = 5, minOcc = 2L)),
    // SemDeDup: seeded-centroid clustering bounds the pair join to
    // within-cluster comparisons; fixed 2000-vector shard gate (the
    // operator is generic — the shard keeps the oracle's pair join
    // a constant size across scale factors, like vec_id<5 does for
    // the top-k queries)
    "dedup_semantic" -> ((s, dir) =>
      KMeansOp.semanticDupPairs(
        t(s, dir, "embeddings").where(col("vec_id") < 2000L),
        "vec_id", "embedding", seedLo = 120L, seedHi = 136L,
        // the synthetic embedding space is near-random (global max
        // pair cosine ≈ 0.51), so the fixture gate runs at 0.4; at
        // web scale the operating point is ~0.9 — same machinery.
        // maxCluster is the production default shape (cap ON): any
        // cell over 150 members switches to star linking, and the
        // oracle models the same cap.
        dim = 64, minCosine = 0.4, maxCluster = Some(150L)))
  )

  val dedupExactSql: String =
    """WITH g AS (SELECT text, count(*) AS c FROM documents GROUP BY text)
      |SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_distinct,
      |CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS n_dup_rows,
      |CAST(coalesce(sum(CASE WHEN c > 1 THEN 1 END), 0) AS BIGINT) AS n_dup_groups
      |FROM g""".stripMargin

  /** The capped shingle-index CTE trio (`<p>0` exploded distinct
    * 3-grams, `<p>_hot` over-cap shingles, `<p>` the capped index)
    * over an arbitrary (doc_id, text) source — the ONE home of the
    * oracle-side gram construction; every n-gram oracle (pair
    * queries, contamination, the pipeline funnel) composes this so
    * cap/gram semantics can never drift apart between them. */

  val dedupNgramSql: String = ngramSql(0.5)

  /** [[graft.ops.Dedup.fuzzyPairs]] mirror: the J≥0.3 blocking pairs,
    * byte-Levenshtein (≡ codepoint on this ASCII corpus, asserted by
    * the langid fixture being ASCII), the raw one-division ratio in
    * the filter, sig5 on the emitted value only. */

  val dedupFuzzySql: String =
    s"""WITH p AS (SELECT id_a, id_b FROM (${ngramSql(0.3)})),
       |v AS (SELECT p.id_a, p.id_b,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       |  CAST(greatest(length(a.text), length(b.text)) AS DOUBLE) AS ln
       |  FROM p JOIN documents a ON a.doc_id = p.id_a
       |  JOIN documents b ON b.doc_id = p.id_b)
       |SELECT id_a, id_b, edit_dist,
       |${sig("CAST(edit_dist AS DOUBLE) / ln")} AS norm_dist
       |FROM v WHERE CAST(edit_dist AS DOUBLE) / ln <= 0.05
       |ORDER BY id_a, id_b""".stripMargin

  val dedupMinhashSql: String = ngramSql(0.8)

  val dedupSimhashSql: String = ngramSql(0.9)

  /** [[graft.ops.Dedup.containmentPairs]] mirror over the quote-
    * augmented corpus: same shingle CTE trio, containment acceptance
    * in place of Jaccard. */

  val dedupContainmentSql: String =
    s"""WITH qsrc AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    array_to_string(w[1:15], ' ') AS text
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM documents)
       |  WHERE doc_id % 17 = 0 AND len(w) >= 15),
       |${shingleCteSql("sh", "qsrc")},
       |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |       FROM sh a JOIN sh b
       |         ON a.shingle = b.shingle AND a.id < b.id
       |       GROUP BY a.id, b.id)
       |SELECT pr.id_a, pr.id_b,
       |  ${sig("CAST(inter AS DOUBLE) / sa.sz")} AS c_a,
       |  ${sig("CAST(inter AS DOUBLE) / sb.sz")} AS c_b
       |FROM pr JOIN sz sa ON sa.id = pr.id_a
       |  JOIN sz sb ON sb.id = pr.id_b
       |WHERE greatest(CAST(inter AS DOUBLE) / sa.sz,
       |               CAST(inter AS DOUBLE) / sb.sz) >= 0.9
       |ORDER BY id_a, id_b""".stripMargin

  /** Exact CROSS-side Jaccard pairs (src0 batch × catalog) at J≥0.8 —
    * the incremental-dedup ground truth, per-side df caps mirroring
    * the per-side Spark signature computation. The raw double
    * division is bit-identical across engines (integer-derived
    * operands, one IEEE op) — same contract as [[ngramSql]]. */

  val dedupIncrementalSql: String =
    s"""WITH ${shingleCteSql("inc",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")},
       |${shingleCteSql("cat",
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')")},
       |isz AS (SELECT id, count(*) AS sz FROM inc GROUP BY id),
       |csz AS (SELECT id, count(*) AS sz FROM cat GROUP BY id),
       |pr AS (SELECT i.id AS inc_id, c.id AS cat_id, count(*) AS inter
       |       FROM inc i JOIN cat c ON c.shingle = i.shingle
       |       GROUP BY 1, 2)
       |SELECT pr.inc_id, pr.cat_id,
       |  CAST(inter AS DOUBLE) / (si.sz + sc.sz - inter) AS jaccard
       |FROM pr JOIN isz si ON si.id = pr.inc_id
       |JOIN csz sc ON sc.id = pr.cat_id
       |WHERE CAST(inter AS DOUBLE) / (si.sz + sc.sz - inter) >= 0.8
       |ORDER BY inc_id, cat_id""".stripMargin

  val dedupClusterStatsSql: String =
    s"""WITH RECURSIVE $clustersCte,
       |cs AS (SELECT cluster_id, count(*) AS size FROM cl
       |       GROUP BY cluster_id)
       |SELECT CAST(size AS BIGINT) AS size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(size) AS BIGINT) AS n_docs
       |FROM cs GROUP BY size ORDER BY size""".stripMargin

  val dedupKeepSql: String =
    s"""WITH RECURSIVE $clustersCte,
       |s AS (SELECT count(*) AS n_in_clusters,
       |      count(DISTINCT cluster_id) AS n_clusters FROM cl),
       |n AS (SELECT count(doc_id) AS n_docs FROM documents)
       |SELECT CAST(n_docs AS BIGINT) AS n_docs,
       |CAST(n_in_clusters AS BIGINT) AS n_in_clusters,
       |CAST(n_in_clusters - n_clusters AS BIGINT) AS n_dropped,
       |CAST(n_docs - n_in_clusters + n_clusters AS BIGINT) AS n_kept
       |FROM n, s""".stripMargin

  val dedupSemanticIncrementalSql: String = {
    // the candidate-pair cosine rides list_dot_product (same
    // left-to-right summation as the exploded SUM it replaces,
    // sig5-rounded output) so the probe x cell-member set streams
    // as O(dim) scalar work per pair instead of a 64x exploded
    // join — the intermediate that exhausted spill at sf1
    val listCosExpr = sig("list_dot_product(a.e, b.e) / " +
      "(sqrt(list_dot_product(a.e, a.e)) * " +
      "sqrt(list_dot_product(b.e, b.e)))")
    s"""WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |       FROM embeddings, range(1, 65) t(i)),
       |c0 AS (SELECT vec_id AS cid, i, v AS w FROM el
       |       WHERE vec_id BETWEEN 100 AND 131 AND vec_id % 2 = 0),
       |cn0 AS (SELECT cid, sum(w * w) AS cn2 FROM c0 GROUP BY 1),
       |cd0 AS (SELECT a.vec_id AS vid, c.cid, sum(a.v * c.w) AS dp
       |       FROM el a JOIN c0 c ON c.i = a.i
       |       WHERE a.vec_id % 2 = 0 GROUP BY 1, 2),
       |ta AS (SELECT vid, cid FROM (
       |   SELECT vid, cd0.cid, row_number() OVER (PARTITION BY vid
       |     ORDER BY ${sig("cn2 - 2 * dp")} ASC, cd0.cid ASC) AS rn
       |   FROM cd0 JOIN cn0 ON cn0.cid = cd0.cid) WHERE rn = 1),
       |c1 AS (SELECT ta.cid, el.i, avg(el.v) AS w FROM el
       |       JOIN ta ON ta.vid = el.vec_id GROUP BY 1, 2),
       |cn AS (SELECT cid, sum(w * w) AS cn2 FROM c1 GROUP BY 1),
       |cd AS (SELECT a.vec_id AS vid, c.cid, sum(a.v * c.w) AS dp
       |       FROM el a JOIN c1 c ON c.i = a.i GROUP BY 1, 2),
       |sc AS (SELECT vid, cd.cid, ${sig("cn2 - 2 * dp")} AS score
       |       FROM cd JOIN cn ON cn.cid = cd.cid),
       |rk AS (SELECT vid, cid, row_number() OVER (PARTITION BY vid
       |       ORDER BY score ASC, cid ASC) AS rn FROM sc),
       |assign AS (SELECT vid, cid AS cell FROM rk
       |           WHERE vid % 2 = 0 AND rn = 1),
       |probes AS (SELECT vid AS qid, cid AS cell FROM rk
       |           WHERE vid % 2 = 1 AND rn <= 2),
       |cand AS (SELECT p.qid, a.vid FROM probes p
       |         JOIN assign a ON a.cell = p.cell WHERE a.vid <> p.qid),
       |emb AS MATERIALIZED (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings WHERE len(embedding) = 64),
       |cos AS (SELECT c.qid, c.vid, $listCosExpr AS cosine
       |        FROM cand c JOIN emb a ON a.vec_id = c.qid
       |        JOIN emb b ON b.vec_id = c.vid
       |        WHERE $listCosExpr IS NOT NULL),
       |best AS (SELECT qid, max(cosine) AS best_cosine FROM cos
       |         GROUP BY 1),
       |bm AS (SELECT cos.qid, best_cosine, min(vid) AS best_match
       |       FROM cos JOIN best ON best.qid = cos.qid
       |         AND cos.cosine = best.best_cosine
       |       GROUP BY 1, 2)
       |SELECT b.vec_id, bm.best_match, bm.best_cosine,
       |CAST(CASE WHEN bm.best_cosine >= 0.4 THEN 1 ELSE 0 END
       |  AS BIGINT) AS is_dup
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 1) b
       |LEFT JOIN bm ON bm.qid = b.vec_id
       |ORDER BY b.vec_id""".stripMargin
  }

  /** IVF assignment re-derived: same cell CTEs as [[embedAnnIvfSql]]
    * (argmin over sig5-rounded |c|²−2·v·c with cid tie-break), whole
    * corpus, one row per vector. */
  /** The BPE-training oracle: every iteration (pair counts → best
    * pair → vocab rewrite) unrolled as CTEs — the learned merge
    * TABLE is value-checked, not just sampled. chr(2)/chr(1) are
    * the symbol markers/separator (BpeTrain.Mark/Sep); greedy-left
    * literal replace on that encoding ≡ BPE's merge pass. */

  /** Unthresholded [[ngramSql]] pairs + conditional sums per τ. */
  val dedupThresholdCurveSql: String =
    s"""WITH p AS (SELECT jaccard FROM (${ngramSql(0.0)})),
       |ks(threshold) AS (VALUES (0.3), (0.5), (0.7), (0.8), (0.9))
       |SELECT CAST(threshold AS DOUBLE) AS threshold,
       |  CAST(coalesce(sum(CASE WHEN jaccard >= threshold
       |    THEN 1 END), 0) AS BIGINT) AS n_pairs
       |FROM ks CROSS JOIN p GROUP BY threshold
       |ORDER BY threshold""".stripMargin

  val dedupExactBySourceSql: String =
    s"""WITH g AS (SELECT source, text, count(*) AS c
       |  FROM documents GROUP BY source, text)
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_rows,
       |  count(*) AS n_distinct,
       |  CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
       |    AS n_dup_rows,
       |  ${sig("CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS DOUBLE) / sum(c)")}
       |    AS dup_share
       |FROM g GROUP BY source ORDER BY source""".stripMargin

  // banded-LSH geometry for dedup_embed, shared by the Spark query and
  // the oracle SQL (which embeds the very same hyperplane components
  // as literals, so the bucketing is replicated bit-for-bit)
  val EmbedBands = 8

  val EmbedRows = 4

  /** (plane_index, 1-based_component, weight) VALUES list for a
    * deterministic hyperplane array — Double.toString round-trips
    * exactly, so DuckDB parses the identical IEEE value. */

  val dedupEmbedSql: String = {
    // per-plane LIST literals + list_dot_product: the banded
    // candidate set is quadratic in cell occupancy (~10^8 pairs at
    // 20k random vectors), so the 64-dim exploded join the old
    // replay used materialized ~6x10^9 rows and exhausted spill at
    // sf1; a native O(64) scalar dot per pair streams instead.
    // list_dot_product sums left-to-right like the SUM(el join) it
    // replaces (parity asserted bit-identical on the fixture) and
    // every emitted value stays sig5-rounded. Unlike the exploded
    // join (which NULL-skipped ragged lists), list_dot_product RAISES
    // on length mismatch — the len(embedding) = 64 guard keeps a
    // hypothetical malformed row a value-level event instead of a
    // whole-oracle error (the embedMarginMineAnnSql precedent).
    val planeLists = Similarity.hyperplanes(EmbedBands * EmbedRows, 64)
      .zipWithIndex
      .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
      .mkString(", ")
    s"""WITH planes(pj, w) AS (VALUES $planeLists),
       |emb AS MATERIALIZED (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings WHERE len(embedding) = 64),
       |proj AS (SELECT m.vec_id, p.pj,
       |         list_dot_product(m.e, p.w) AS pr
       |         FROM emb m CROSS JOIN planes p),
       |bh AS (SELECT vec_id, pj // $EmbedRows AS band,
       |       CAST(sum(CASE WHEN pr >= 1e-12
       |         THEN CAST(1 AS BIGINT) << (pj % $EmbedRows)
       |         ELSE 0 END) AS BIGINT) AS bh
       |       FROM proj GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
       |         FROM bh a JOIN bh b
       |         ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id),
       |cos AS (SELECT c.ia, c.ib,
       |        ${sig("list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))")} AS cosine
       |        FROM cand c JOIN emb a ON a.vec_id = c.ia
       |        JOIN emb b ON b.vec_id = c.ib)
       |SELECT ia AS id_a, ib AS id_b, cosine FROM cos
       |WHERE cosine >= 0.5 ORDER BY id_a, id_b""".stripMargin
  }

  /** [[embedCosineSql]] ∩ [[embedAnnLshSql]] per query — the LSH
    * member of the recall trio. */

  val dedupSubstringSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
       |              FROM documents),
       |pos AS (SELECT doc_id, i - 1 AS p,
       |          array_to_string(list_slice(w, i, i + 4), ' ') AS gram
       |        FROM toks, LATERAL unnest(range(1, len(w) - 3)) AS t(i)
       |        WHERE len(w) >= 5),
       |dg AS (SELECT gram FROM pos GROUP BY gram HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, p FROM pos
       |       WHERE gram IN (SELECT gram FROM dg)),
       |runs AS (SELECT doc_id, min(p) AS s, max(p) + 4 AS e
       |         FROM (SELECT doc_id, p, p - row_number()
       |                 OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |               FROM dp)
       |         GROUP BY doc_id, isl),
       |m AS (SELECT doc_id, s, e, max(e) OVER (PARTITION BY doc_id
       |        ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND
       |        1 PRECEDING) AS pme FROM runs),
       |g AS (SELECT doc_id, s, e,
       |        sum(CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0
       |            END) OVER (PARTITION BY doc_id ORDER BY s ROWS
       |            BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |      FROM m),
       |cov AS (SELECT doc_id, grp, min(s) AS cs, max(e) AS ce
       |        FROM g GROUP BY doc_id, grp),
       |pd AS (SELECT doc_id, count(*) AS n_dup_spans,
       |         CAST(sum(ce - cs + 1) AS BIGINT) AS n_dup_tokens
       |       FROM cov GROUP BY doc_id),
       |nt AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |       FROM documents)
       |SELECT pd.doc_id, n_dup_spans, n_dup_tokens, n_tokens,
       |${sig("CAST(n_dup_tokens AS DOUBLE) / n_tokens")} AS dup_frac
       |FROM pd JOIN nt ON nt.doc_id = pd.doc_id
       |ORDER BY pd.doc_id""".stripMargin

  /** Binned two-sample KS: shared-bounds 20-bin histogram per slice,
    * cumulative shares, max gap. */
  /** [[graft.ops.Drift.ksDriftByGroup]] mirror: per-group bounds,
    * per-(group, bin) counts, group-partitioned cumulative CDFs. */

  val dedupSemanticSql: String = {
    val score = sig("cn2 - 2 * dp")
    val cos = sig("dp / (na.nrm * nb.nrm)")
    s"""WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |       FROM embeddings, range(1, 65) t(i) WHERE vec_id < 2000),
       |c0 AS (SELECT vec_id AS cid, i, v AS w FROM el
       |       WHERE vec_id BETWEEN 120 AND 135),
       |cn0 AS (SELECT cid, sum(w * w) AS cn2 FROM c0 GROUP BY cid),
       |d0 AS (SELECT e.vec_id AS vid, c.cid, sum(e.v * c.w) AS dp
       |       FROM el e JOIN c0 c ON c.i = e.i GROUP BY 1, 2),
       |s0 AS (SELECT vid, d0.cid, $score AS score
       |       FROM d0 JOIN cn0 ON cn0.cid = d0.cid),
       |a0 AS (SELECT vid, cid FROM (
       |  SELECT vid, cid, row_number() OVER (PARTITION BY vid
       |    ORDER BY score ASC, cid ASC) AS rn FROM s0) WHERE rn = 1),
       |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM el
       |        GROUP BY vec_id),
       |sz AS (SELECT cid, count(*) AS m, min(vid) AS rep FROM a0
       |       GROUP BY cid),
       |elc AS (SELECT el.vec_id, a0.cid, sz.m, sz.rep, el.i, el.v
       |        FROM el JOIN a0 ON a0.vid = el.vec_id
       |        JOIN sz ON sz.cid = a0.cid),
       |pr AS (SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
       |         sum(a.v * b.v) AS dp
       |       FROM elc a JOIN elc b ON a.cid = b.cid AND a.i = b.i
       |         AND ((a.m <= 150 AND a.vec_id < b.vec_id)
       |           OR (a.m > 150 AND a.vec_id = a.rep
       |               AND b.vec_id <> b.rep))
       |       GROUP BY 1, 2, 3)
       |SELECT cid AS cluster_id, id_a, id_b, $cos AS cosine
       |FROM pr JOIN nrm na ON na.vec_id = id_a
       |JOIN nrm nb ON nb.vec_id = id_b
       |WHERE $cos >= 0.4
       |ORDER BY cluster_id, id_a, id_b""".stripMargin
  }

  /** The tone generator re-derived: sample k of doc d is
    * ((d mod 997) + 7k) mod 4096 − 2048 over n = frames·channels
    * samples; v(k−1) is closed-form too, so zero-crossings need no
    * window. v² sums are integer-exact in doubles (< 2⁵³), so the
    * RMS is bit-identical regardless of summation order. */

  /** Blocked mirror of [[Shared.ngramSql]]: the block (lang) rides
    * the shingle-join key and the df cap applies per block. */
  val dedupNgramBlockedSql: String =
    s"""WITH sh0 AS (
       |  SELECT id, blk, unnest(grams) AS shingle FROM (
       |    SELECT doc_id AS id, lang AS blk,
       |      list_distinct(list_transform(range(1, len(w) - 1),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
       |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
       |          FROM documents))),
       |hot AS (SELECT blk, shingle FROM sh0 GROUP BY blk, shingle
       |        HAVING count(*) > $NgramMaxDf),
       |sh AS (SELECT * FROM sh0 WHERE NOT EXISTS (
       |    SELECT 1 FROM hot
       |    WHERE hot.blk = sh0.blk AND hot.shingle = sh0.shingle)),
       |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |pr AS (SELECT a.blk AS block, a.id AS id_a, b.id AS id_b,
       |         count(*) AS inter
       |       FROM sh a JOIN sh b ON a.blk = b.blk
       |         AND a.shingle = b.shingle AND a.id < b.id
       |       GROUP BY a.blk, a.id, b.id)
       |SELECT pr.block, pr.id_a, pr.id_b,
       |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |FROM pr JOIN sz sa ON sa.id = pr.id_a
       |  JOIN sz sb ON sb.id = pr.id_b
       |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
       |ORDER BY block, id_a, id_b""".stripMargin

  /** Chunk-level near-dup re-derived: the chunk oracle's window
    * slicing rebased to composite ids, then the standard shingle
    * self-join chain (the shingleCteSql src parameter doing its
    * job); the composite id decodes with integer div/mod on both
    * engines. Jaccard is one division of exact integers —
    * bit-equal, no sig5. */
  val chunkDedupSql: String = {
    val chunkSrc =
      """(SELECT doc_id * 1000000000 + chunk_idx AS doc_id,
        |  chunk_text AS text FROM (
        |  SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
        |    array_to_string(ts[start + 1 : start + 64], ' ')
        |      AS chunk_text
        |  FROM (SELECT doc_id, ts,
        |      unnest(range(0, len(ts), 48)) AS start
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ts
        |          FROM documents))))""".stripMargin
    s"""WITH ${shingleCteSql("sh", chunkSrc)},
       |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |       FROM sh a JOIN sh b
       |       ON a.shingle = b.shingle AND a.id < b.id
       |       GROUP BY a.id, b.id),
       |pj AS (SELECT pr.id_a, pr.id_b,
       |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |  FROM pr JOIN sz sa ON sa.id = pr.id_a
       |  JOIN sz sb ON sb.id = pr.id_b
       |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.8)
       |SELECT id_a // 1000000000 AS doc_a,
       |id_a % 1000000000 AS chunk_a,
       |id_b // 1000000000 AS doc_b,
       |id_b % 1000000000 AS chunk_b, jaccard
       |FROM pj ORDER BY doc_a, chunk_a, doc_b, chunk_b""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "chunk_dedup" -> chunkDedupSql,
    // banded production twins share the exact plans' oracles: the
    // declared contract is "identical values wherever banding recall
    // is 1", and the compare enforces it
    "chunk_dedup_banded" -> chunkDedupSql,
    "dedup_ngram_banded" -> dedupNgramSql,
    "dedup_clusters_banded" -> dedupClustersSql,
    "dedup_keep_banded" -> dedupKeepSql,
    "dedup_fuzzy_banded" -> dedupFuzzySql,
    "dedup_containment_routed" -> dedupContainmentSql,
    "dedup_simhash_banded" -> dedupSimhashSql,
    "dedup_threshold_curve_banded" -> dedupThresholdCurveSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_substring" -> dedupSubstringSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram" -> dedupNgramSql,
    "dedup_ngram_blocked" -> dedupNgramBlockedSql,
    "dedup_fuzzy" -> dedupFuzzySql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_cluster_stats" -> dedupClusterStatsSql,
    "dedup_keep" -> dedupKeepSql,
    "dedup_embed" -> dedupEmbedSql,
    "dedup_semantic_incremental" -> dedupSemanticIncrementalSql,
    "dedup_exact_by_source" -> dedupExactBySourceSql,
    "dedup_threshold_curve" -> dedupThresholdCurveSql
  )
}
