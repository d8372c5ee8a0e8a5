package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops._
import graft.pipeline.CorpusPipeline

/** Sampling / selection queries. Split from the monolithic Extensions
  * registry (round 11) — pure move, zero behavior; every
  * query keeps its DuckDB oracle. */
object SampleQueries {

  import Shared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic stratified sample: 10% of each language, lowest
    // doc_ids — exact fractions, fully oracle-expressible
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedExact(t(s, dir, "documents"), "lang", "doc_id",
          0.1)
        .select("doc_id", "lang").orderBy("doc_id")),
    // the production stratified form: same EXACT per-stratum quota,
    // but admission is a histogram-derived hash threshold (map-only
    // for everything except the single boundary bucket) — no stratum
    // is ever sorted through one task, so a 90%-skewed language costs
    // a hash-agg, not a corpus sort. The oracle states the same
    // selection as one window expression over the re-derived
    // minstd bucket.
    "sample_stratified_hash" -> ((s, dir) =>
      Sampling.stratifiedHashExact(t(s, dir, "documents"), "lang",
          "doc_id", 0.1)
        .select("doc_id", "lang").orderBy("doc_id")),
    // quality-proportional subsampling via the MINSTD mille bucket —
    // unlike xxhash64-bound splits this mixer is pure BIGINT
    // arithmetic, so the oracle re-derives the exact kept set
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
          least(col("n_chars") / 400.0, lit(1.0)))
        .select("doc_id", "mille", "w_mille").orderBy("doc_id")),
    // leakage-aware train/val/test split: membership decided by the
    // MINSTD mille of the near-dup CLUSTER representative (the SAME
    // clusters frame dedup_clusters declares), so near-dups never
    // straddle a split; declared as the per-split balance report
    "sample_split" -> ((s, dir) =>
      Sampling.splitStats(t(s, dir, "documents"), docClusters(s, dir),
        "doc_id", "n_chars")),
    // the PRODUCTION-path split: same cluster-representative rule
    // over the BANDED cluster frame (linear candidate generation);
    // same oracle — the cluster frames agree wherever banding recall
    // is 1, which the shared exact oracle pins
    "sample_split_banded" -> ((s, dir) =>
      Sampling.splitStats(t(s, dir, "documents"),
        bandedDocClusters(s, dir), "doc_id", "n_chars")),
    // the leakage AUDIT behind sample_split: near-dup pairs crossing
    // a split boundary under the naive per-doc hash vs the
    // cluster-representative split (whose cross count is zero BY
    // CONSTRUCTION — published, so a broken cluster map fails loud)
    "split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // r17: the pair plan feeds TWO separate actions (the cluster
      // build materializes its canonical edges; the leakage join is
      // the final collect) — materialize it ONCE or the Σdf² index
      // self-join executes twice (the spearmanMatrix lesson, §1.2)
      val pairs = Materialize.materialize(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.5, maxDf = Some(NgramMaxDf)))
      Sampling.splitLeakage(docs, pairs,
        Dedup.duplicateClustersStar(pairs), "doc_id")
    }),
    // the leakage audit on the PRODUCTION pair plan — banded
    // candidates, exact verify; one pair frame feeds both the naive
    // cross count and the cluster split, exactly as split_leakage
    "split_leakage_banded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // materialized once — two consumers, see split_leakage (r17)
      val pairs = Materialize.materialize(
        Dedup.minhashVerifiedPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.5, maxDf = Some(NgramMaxDf)))
      Sampling.splitLeakage(docs, pairs,
        Dedup.duplicateClustersStar(pairs), "doc_id")
    }),
    // the leakage audit on the ROUTED pair dispatch (r15): exact
    // pairs below the corpus-size threshold, banded-verified above —
    // the no-config production path; same oracle (all arms
    // value-identical where banding recall is 1)
    "split_leakage_routed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // materialized once — two consumers, see split_leakage (r17)
      val pairs = Materialize.materialize(
        Dedup.ngramJaccardPairsRouted(docs, "doc_id",
          "text", n = 3, minJaccard = 0.5, maxDf = Some(NgramMaxDf)))
      Sampling.splitLeakage(docs, pairs,
        Dedup.duplicateClustersStar(pairs), "doc_id")
    }),
    // data mixing to target source proportions: the largest sample
    // hitting the requested 50/30/20 mix given availability —
    // per-stratum quotas from one tiny broadcast reduction
    "sample_mixture" -> ((s, dir) =>
      Sampling.mixtureSample(t(s, dir, "documents"), "source", "doc_id",
          MixtureWeights)
        .select("doc_id", "source").orderBy("doc_id")),
    // exact-mixture quotas on the hash-threshold scale path (the
    // sample_stratified_hash machinery fed by the mixture quota
    // derivation) — the form that survives a dominant stratum
    "sample_mixture_hash" -> ((s, dir) =>
      Sampling.mixtureSampleHash(t(s, dir, "documents"), "source",
          "doc_id", MixtureWeights)
        .select("doc_id", "source").orderBy("doc_id")),
    // temperature-scaled mixture quotas: stratum share ∝ n^(1/T)
    // (T = 2 here) — the multilingual re-balancing rule; floor on the
    // sig5-rounded share keeps the discrete quota cross-engine exact
    "sample_temperature" -> ((s, dir) =>
      Sampling.temperatureQuotas(t(s, dir, "documents"), "lang",
        budget = 1000L, invT = 0.5)),
    // DSIR-style data selection: raw docs scored by the unigram
    // log-likelihood ratio against the src0 target slice, top 25 kept
    // (rank on sig5-ROUNDED weight, doc_id tie-break)
    "dsir_select" -> ((s, dir) =>
      Dsir.topByImportance(t(s, dir, "documents"), "doc_id", "text",
        col("source") === "src0", topK = 25)),
    // loss-aware mixture reweighting (the DoReMi signal): hard
    // domains upweighted via exp(excess NLL / T) → shares → quotas
    "sample_mixture_loss" -> ((s, dir) =>
      Sampling.mixtureByLoss(t(s, dir, "documents"), "doc_id",
        "text", "source", budget = 1000L)),
    // diversity-aware selection: one best-quality doc per Voronoi
    // cell of the embedding space (the SemDeDup/k-center selection
    // shape) — map-only assignment + windowless per-cell argmax
    "sample_diverse" -> ((s, dir) =>
      Sampling.diverseByCell(t(s, dir, "embeddings"), "vec_id",
        "embedding", t(s, dir, "documents"), "doc_id", "n_chars",
        100L, 116L)),
    "sample_quota" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val q = TextStats.quality(d, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      q.join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .where(col("quality").isNotNull) // heap contract: non-null score
        .groupBy("lang")
        .agg(graft.functions.TopKByScore.top_k(5)(
          col("quality"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("p", "e")))
        .select(col("lang"), (col("p") + 1).cast("long").as("rnk"),
          col("e._2").as("doc_id"), col("e._1").as("quality"))
        .orderBy("lang", "rnk")
    })
  )

  val MixtureWeights: Map[String, Double] =
    Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2)

  // ------------------------- oracle SQL ---------------------------- //

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents)
      |WHERE rn <= ceil(cnt * 0.1) ORDER BY doc_id""".stripMargin

  /** The hash-threshold sampler's SPEC as one window expression: the
    * quota smallest rows per stratum under (minstd bucket, doc_id) —
    * the Spark side reaches the same set through the histogram
    * thresholds without sorting any stratum. Quota arithmetic runs
    * on DOUBLE in both engines (identical IEEE multiply+ceil, no
    * DECIMAL boundary luck). */

  val sampleStratifiedHashSql: String =
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${minstdHashSql("doc_id")} % 1000000, doc_id)
       |      AS rn,
       |    count(*) OVER (PARTITION BY lang) AS cnt
       |  FROM documents)
       |WHERE rn <= CAST(ceil(CAST(cnt AS DOUBLE) * CAST(0.1 AS DOUBLE))
       |  AS BIGINT) ORDER BY doc_id""".stripMargin

  val sampleMixtureLossSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |             FROM documents),
       |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
       |tot AS (SELECT sum(c) AS total FROM freq),
       |dnll AS (SELECT doc_id,
       |  ${sig("avg(-ln(CAST(c AS DOUBLE) / total))")} AS nll
       |  FROM tok JOIN freq ON freq.t = tok.t, tot GROUP BY doc_id),
       |src AS (SELECT d.source, count(*) AS n_docs,
       |  ${sig("avg(nll)")} AS nll
       |  FROM dnll JOIN documents d ON d.doc_id = dnll.doc_id
       |  GROUP BY 1),
       |mn AS (SELECT min(nll) AS mn FROM src),
       |w AS (SELECT source, n_docs, nll,
       |      exp((nll - mn) / 0.5) AS w FROM src, mn),
       |tw AS (SELECT sum(w) AS tw FROM w)
       |SELECT source, n_docs, nll, ${sig("w / tw")} AS share,
       |CAST(floor((${sig("w / tw")}) * 1000.0) AS BIGINT) AS quota
       |FROM w, tw ORDER BY source""".stripMargin

  val sampleDiverseSql: String =
    s"""WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |       FROM embeddings, range(1, 65) t(i)
       |       WHERE len(embedding) = 64),
       |cn AS (SELECT vec_id AS cid, sum(v * v) AS cn2 FROM el
       |       WHERE vec_id BETWEEN 100 AND 115 GROUP BY 1),
       |cd AS (SELECT a.vec_id AS vid, c.vec_id AS cid, sum(a.v * c.v) AS dp
       |       FROM el a JOIN el c ON c.i = a.i
       |       AND c.vec_id BETWEEN 100 AND 115 GROUP BY 1, 2),
       |sc AS (SELECT vid, cd.cid, ${sig("cn2 - 2 * dp")} AS score
       |       FROM cd JOIN cn ON cn.cid = cd.cid),
       |cells AS (SELECT vid, cid AS cell FROM (
       |  SELECT vid, cid, row_number() OVER (PARTITION BY vid
       |    ORDER BY score ASC, cid ASC) AS rn FROM sc) WHERE rn = 1),
       |j AS (SELECT c.cell, c.vid, CAST(d.n_chars AS DOUBLE) AS q
       |      FROM cells c JOIN documents d ON d.doc_id = c.vid)
       |SELECT cell, vid AS vec_id, q AS quality, n_members FROM (
       |  SELECT cell, vid, q,
       |    count(*) OVER (PARTITION BY cell) AS n_members,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY q DESC, vid ASC) AS rn FROM j)
       |WHERE rn = 1 ORDER BY cell""".stripMargin

  val sampleSplitSql: String =
    s"""WITH RECURSIVE $clustersCte,
       |rep AS (SELECT d.doc_id, d.n_chars,
       |        coalesce(cl.cluster_id, d.doc_id) AS rep
       |        FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
       |sp AS (SELECT rep, n_chars,
       |  ((((((rep + 12345) % 2147483647) * 48271) % 2147483647)
       |    * 48271) % 2147483647) % 1000 AS mille FROM rep)
       |SELECT CASE WHEN mille < 800 THEN 'train'
       |            WHEN mille < 900 THEN 'val'
       |            ELSE 'test' END AS split,
       |CAST(count(*) AS BIGINT) AS n_docs,
       |CAST(count(DISTINCT rep) AS BIGINT) AS n_groups,
       |CAST(sum(n_chars) AS BIGINT) AS n_chars
       |FROM sp GROUP BY 1 ORDER BY split""".stripMargin

  /** Leakage audit re-derived: the SAME pairs + recursive cluster
    * closure as [[sampleSplitSql]], each pair endpoint labeled under
    * both the own-id and the representative MINSTD mille, crossing
    * counts from one aggregate fanned to the two mode rows. */
  val splitLeakageSql: String = {
    def mille(x: String): String =
      s"(((((($x + 12345) % 2147483647) * 48271) % 2147483647)" +
        s" * 48271) % 2147483647) % 1000"
    def lbl(m: String): String =
      s"CASE WHEN $m < 800 THEN 'train' WHEN $m < 900 THEN 'val'" +
        s" ELSE 'test' END"
    s"""WITH RECURSIVE $clustersCte,
       |lbl AS (SELECT d.doc_id,
       |  ${lbl(mille("d.doc_id"))} AS naive,
       |  ${lbl(mille("coalesce(cl.cluster_id, d.doc_id)"))} AS aware
       |  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
       |px AS (SELECT a.naive AS na, b.naive AS nb2,
       |  a.aware AS aa, b.aware AS ab
       |  FROM pairs p JOIN lbl a ON a.doc_id = p.id_a
       |  JOIN lbl b ON b.doc_id = p.id_b),
       |agg AS (SELECT count(*) AS np,
       |  sum(CASE WHEN na <> nb2 THEN 1 ELSE 0 END) AS xn,
       |  sum(CASE WHEN aa <> ab THEN 1 ELSE 0 END) AS xa FROM px)
       |SELECT 'cluster_rep' AS mode, CAST(np AS BIGINT) AS n_pairs,
       |  CAST(xa AS BIGINT) AS n_cross,
       |  ${sig("CAST(xa AS DOUBLE) / np")} AS cross_share FROM agg
       |UNION ALL
       |SELECT 'naive', CAST(np AS BIGINT), CAST(xn AS BIGINT),
       |  ${sig("CAST(xn AS DOUBLE) / np")} FROM agg
       |ORDER BY mode""".stripMargin
  }

  /** Per-window association re-derived: hourly contingency (same
    * epoch-micros window arithmetic as [[eventsWindowSql]]), window
    * marginals, then the SAME observed-cells identities as
    * [[assocPairSql]] grouped by window. */

  val sampleMixtureSql: String = {
    val values = MixtureWeights.toSeq.sorted
      .map { case (k, v) => s"('$k', $v)" }.mkString(", ")
    s"""WITH w(stratum, wt) AS (VALUES $values),
       |avail AS (SELECT source AS stratum, count(*) AS n
       |          FROM documents GROUP BY source),
       |a AS (SELECT w.stratum, n, wt FROM avail
       |      JOIN w ON w.stratum = avail.stratum),
       |sc AS (SELECT min(n / wt) AS scale FROM a),
       |q AS (SELECT stratum, CAST(floor(scale * wt) AS BIGINT) AS quota
       |      FROM a, sc),
       |r AS (SELECT doc_id, source, quota,
       |        row_number() OVER (PARTITION BY source ORDER BY doc_id)
       |          AS rn
       |      FROM documents d JOIN q ON q.stratum = d.source)
       |SELECT doc_id, source FROM r WHERE rn <= quota
       |ORDER BY doc_id""".stripMargin
  }

  /** [[sampleMixtureSql]]'s quota derivation with the hash-threshold
    * selection rule (minstd bucket, doc_id) — the
    * sample_stratified_hash spec applied to mixture quotas. */

  val sampleMixtureHashSql: String = {
    val values = MixtureWeights.toSeq.sorted
      .map { case (k, v) => s"('$k', $v)" }.mkString(", ")
    s"""WITH w(stratum, wt) AS (VALUES $values),
       |avail AS (SELECT source AS stratum, count(*) AS n
       |          FROM documents GROUP BY source),
       |a AS (SELECT w.stratum, n, wt FROM avail
       |      JOIN w ON w.stratum = avail.stratum),
       |sc AS (SELECT min(n / wt) AS scale FROM a),
       |q AS (SELECT stratum, CAST(floor(scale * wt) AS BIGINT) AS quota
       |      FROM a, sc),
       |r AS (SELECT doc_id, source, quota,
       |        row_number() OVER (PARTITION BY source
       |          ORDER BY ${minstdHashSql("doc_id")} % 1000000, doc_id)
       |          AS rn
       |      FROM documents d JOIN q ON q.stratum = d.source)
       |SELECT doc_id, source FROM r WHERE rn <= quota
       |ORDER BY doc_id""".stripMargin
  }

  /** CUBE with Spark's grouping_id bit order (event_type bit 1,
    * hour bit 0) and integer-micros hour-of-day arithmetic. */

  val sampleTemperatureSql: String =
    s"""WITH c AS (SELECT lang AS stratum, count(*) AS n_docs
       |           FROM documents GROUP BY 1),
       |w AS (SELECT stratum, n_docs,
       |        pow(CAST(n_docs AS DOUBLE), 0.5) AS wgt FROM c),
       |t AS (SELECT sum(wgt) AS tw FROM w)
       |SELECT stratum, n_docs, ${sig("wgt / tw")} AS share,
       |CAST(floor(${sig("wgt / tw")} * 1000.0) AS BIGINT) AS quota
       |FROM w, t ORDER BY stratum""".stripMargin

  /** Novelty re-derived on string grams (no hot cap on either side —
    * unlike the contamination CTEs — because common grams must count
    * as SEEN, not novel). */

  val dsirSelectSql: String =
    s"""WITH tok AS (SELECT doc_id, (source = 'src0') AS tgt,
       |        unnest(string_split(text, ' ')) AS token FROM documents),
       |c AS (SELECT token,
       |        sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ca,
       |        sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cb
       |      FROM tok GROUP BY 1),
       |t AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
       |        CAST(sum(cb) AS DOUBLE) AS nb,
       |        CAST(count(*) AS DOUBLE) AS k FROM c),
       |lr AS (SELECT token, ln(((ca + 0.5) / (na + 0.5 * k)) /
       |        ((cb + 0.5) / (nb + 0.5 * k))) AS lr FROM c, t),
       |w AS (SELECT tok.doc_id, count(*) AS n_tokens,
       |        ${sig("sum(lr)")} AS w
       |      FROM tok JOIN lr USING (token) WHERE NOT tgt GROUP BY 1)
       |SELECT CAST(row_number() OVER (ORDER BY w DESC, doc_id)
       |         AS BIGINT) AS rnk,
       |  doc_id, n_tokens, w
       |FROM w ORDER BY w DESC, doc_id LIMIT 25""".stripMargin

  /** Fixed-reference drift re-derived: literal reference shares from
    * the even slice, candidate shares from the odd slice, PSI/TVD
    * over the reference buckets ∪ `__other__`, KS as the max
    * cumulative-share gap in (bucket, other-last) order — the same
    * fold order as the Scala finisher's scanLeft. */

  val sampleQuotaSql: String = {
    val f = stopOr("x", enStops)
    val quality = sig("CAST(least(nt, 100) AS DOUBLE) / 100.0 * 0.3 " +
      "+ CAST(ns AS DOUBLE) / nt * 0.4 + CAST(nd AS DOUBLE) / nt * 0.3")
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t
       |           FROM documents),
       |e AS (SELECT doc_id, lang, len(t) AS nt,
       |  len(list_distinct(t)) AS nd,
       |  len(list_filter(t, x -> $f)) AS ns FROM d),
       |q AS (SELECT doc_id, lang, $quality AS quality FROM e),
       |r AS (SELECT lang, doc_id, quality, row_number() OVER (
       |        PARTITION BY lang ORDER BY quality DESC, doc_id) AS rnk
       |      FROM q WHERE quality IS NOT NULL)
       |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, quality
       |FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "dsir_select" -> dsirSelectSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_diverse" -> sampleDiverseSql,
    "sample_mixture_loss" -> sampleMixtureLossSql,
    "sample_quota" -> sampleQuotaSql,
    "sample_mixture" -> sampleMixtureSql,
    "sample_mixture_hash" -> sampleMixtureHashSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_stratified_hash" -> sampleStratifiedHashSql,
    "sample_weighted" -> sampleWeightedSql,
    "sample_split" -> sampleSplitSql,
    "split_leakage" -> splitLeakageSql,
    // banded twins: identical declared values, shared exact oracles
    "sample_split_banded" -> sampleSplitSql,
    "split_leakage_banded" -> splitLeakageSql,
    "split_leakage_routed" -> splitLeakageSql
  )
}
