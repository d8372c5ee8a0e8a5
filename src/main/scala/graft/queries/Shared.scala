package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops._
import graft.pipeline.CorpusPipeline

/** Cross-family helpers shared by the split query registries
  * (round-11 refactor of the monolithic Extensions object —
  * pure move, zero behavior). */
private[queries] object Shared {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def sig(x: String) = Sig.sql(x)

  // English stopword list shared by Spark exprs and oracle SQL.
  val enStops = TextStats.stopwords.toMap.apply("en")

  def stopOr(v: String, ws: Seq[String]): String =
    ws.map(w => s"$v = '$w'").mkString(" OR ")

  /** Hot-shingle document-frequency cap (CCNet-style) used by every
    * declared n-gram query AND its oracle SQL, so the scale guard is
    * always on in production shape; no fixture shingle exceeds df 25,
    * so the capped results equal the uncapped ones at test sf. */

  val NgramMaxDf = 1000L

  /** The canonical near-dup cluster frame — the ONE construction
    * shared by `dedup_clusters` and `dedup_keep`, so the keep stats
    * are computed over exactly the clusters the cluster query
    * declares and the two can never drift. */

  def docClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateClustersStar(
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDf = Some(NgramMaxDf)))

  /** The PRODUCTION-path twin of [[docClusters]]: candidate pairs
    * from MinHash banding, exact Jaccard verified on candidates only
    * ([[Dedup.minhashVerifiedPairs]] — linear, no Σdf² index
    * self-join). Identical cluster frame wherever banding recall is 1
    * (the fixtures — pinned by the shared exact oracle). */
  def bandedDocClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateClustersStar(
      Dedup.minhashVerifiedPairs(t(s, dir, "documents"), "doc_id",
        "text", n = 3, minJaccard = 0.5, maxDf = Some(NgramMaxDf)))

  def shingleCteSql(p: String, src: String): String =
    s"""${p}0 AS (
       |  SELECT id, unnest(grams) AS shingle FROM (
       |    SELECT doc_id AS id,
       |      list_distinct(list_transform(range(1, len(w) - 1),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
       |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $src))),
       |${p}_hot AS (SELECT shingle FROM ${p}0 GROUP BY shingle
       |        HAVING count(*) > $NgramMaxDf),
       |$p AS (SELECT * FROM ${p}0
       |       WHERE shingle NOT IN (SELECT shingle FROM ${p}_hot))""".stripMargin

  /** Exact n-gram Jaccard pairs at `minJ`, with the same hot-shingle
    * df cap as the Spark side (no fixture shingle reaches the cap, so
    * the CTE also serves as the uncapped ground truth). */

  def ngramSql(minJ: Double): String =
    s"""WITH ${shingleCteSql("sh", "documents")},
       |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
       |       GROUP BY a.id, b.id)
       |SELECT pr.id_a, pr.id_b,
       |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |FROM pr JOIN sz sa ON sa.id = pr.id_a JOIN sz sb ON sb.id = pr.id_b
       |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= $minJ
       |ORDER BY id_a, id_b""".stripMargin

  def clustersCte: String =
    // MATERIALIZED: without the hint DuckDB inlines `pairs` into the
    // recursive closure and re-evaluates the Σdf² shingle self-join
    // PER ITERATION — at the 500k-doc heaps tier that exhausted 80 GB
    // of spill where the plain pair oracle (one evaluation) passed
    s"""pairs AS MATERIALIZED (SELECT id_a, id_b FROM (${ngramSql(0.5)})),
       |und AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
       |        UNION SELECT id_b, id_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM und)
       |  UNION
       |  SELECT e.a, r.b FROM und e JOIN reach r ON r.a = e.b),
       |cl AS (SELECT a AS doc_id, min(b) AS cluster_id
       |       FROM reach GROUP BY a)""".stripMargin

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $clustersCte
       |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin

  val embedCosineSql: String = {
    val cosExpr = sig("dp / (na.nrm * nb.nrm)")
    s"""WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |            FROM embeddings, range(1, 65) t(i)),
       |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM el GROUP BY vec_id),
       |dot AS (SELECT a.vec_id AS qid, b.vec_id AS vid, sum(a.v * b.v) AS dp
       |        FROM el a JOIN el b ON a.i = b.i AND b.vec_id <> a.vec_id
       |        WHERE a.vec_id < 5 GROUP BY 1, 2),
       |cos AS (SELECT qid, vid, $cosExpr AS cosine
       |        FROM dot JOIN nrm na ON na.vec_id = dot.qid
       |        JOIN nrm nb ON nb.vec_id = dot.vid)
       |SELECT query_id, rnk, neighbor_id, cosine FROM (
       |  SELECT qid AS query_id,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS BIGINT) AS rnk,
       |    vid AS neighbor_id, cosine FROM cos)
       |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
  }

  /** [[embedCosineSql]] ∩ [[embedAnnIvfSql]] per query — the recall
    * view composes the two oracle derivations verbatim (subqueries),
    * exactly as the Spark query composes the two operators. */

  val embedAnnIvfSql: String = {
    val cosExpr = sig("dp / (na.nrm * nb.nrm)")
    s"""WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |       FROM embeddings, range(1, 65) t(i)),
       |c0 AS (SELECT vec_id AS cid, i, v AS w FROM el
       |       WHERE vec_id BETWEEN 100 AND 115),
       |cn0 AS (SELECT cid, sum(w * w) AS cn2 FROM c0 GROUP BY 1),
       |cd0 AS (SELECT a.vec_id AS vid, c.cid, sum(a.v * c.w) AS dp
       |       FROM el a JOIN c0 c ON c.i = a.i GROUP BY 1, 2),
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
       |assign AS (SELECT vid, cid AS cell FROM rk WHERE rn = 1),
       |probes AS (SELECT vid AS qid, cid AS cell FROM rk
       |           WHERE vid < 5 AND rn <= 4),
       |cand AS (SELECT p.qid, a.vid FROM probes p
       |         JOIN assign a ON a.cell = p.cell WHERE a.vid <> p.qid),
       |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM el GROUP BY 1),
       |dot AS (SELECT c.qid, c.vid, sum(a.v * b.v) AS dp
       |        FROM cand c JOIN el a ON a.vec_id = c.qid
       |        JOIN el b ON b.vec_id = c.vid AND b.i = a.i
       |        GROUP BY 1, 2),
       |cos AS (SELECT qid, vid, $cosExpr AS cosine
       |        FROM dot JOIN nrm na ON na.vec_id = dot.qid
       |        JOIN nrm nb ON nb.vec_id = dot.vid)
       |SELECT query_id, rnk, neighbor_id, cosine FROM (
       |  SELECT qid AS query_id,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS BIGINT) AS rnk,
       |    vid AS neighbor_id, cosine FROM cos)
       |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
  }

  /** [[graft.ops.Similarity.embedOutliers]] mirror: the SEEDED-cell
    * chain (frozen seed centroids — the operator deliberately skips
    * Lloyd training, whose means an outlier drags; see the operator
    * doc), sig5 score canon, dist² = sig5(score + |v|²), per-cell
    * quantile_cont(0.99) threshold (sig5), rounded comparison. */

  val textQualitySql: String = {
    val f = stopOr("x", enStops)
    s"""WITH d AS (SELECT doc_id, length(text) AS nc,
       |  string_split(text, ' ') AS t FROM documents),
       |e AS (SELECT doc_id, nc, len(t) AS nt, len(list_distinct(t)) AS nd,
       |  len(list_filter(t, x -> $f)) AS ns FROM d)
       |SELECT doc_id, CAST(nc AS BIGINT) AS n_chars,
       |CAST(nt AS BIGINT) AS n_tokens, CAST(nd AS BIGINT) AS n_distinct_tokens,
       |${sig("CAST(ns AS DOUBLE) / nt")} AS stop_ratio,
       |${sig("CAST(nd AS DOUBLE) / nt")} AS distinct_ratio,
       |${sig("CAST(least(nt, 100) AS DOUBLE) / 100.0 * 0.3 + CAST(ns AS DOUBLE) / nt * 0.4 + CAST(nd AS DOUBLE) / nt * 0.3")} AS quality
       |FROM e ORDER BY doc_id""".stripMargin
  }

  val sampleWeightedSql: String =
    """WITH h AS (SELECT doc_id,
      |  ((((((doc_id + 12345) % 2147483647) * 48271) % 2147483647)
      |    * 48271) % 2147483647) % 1000 AS mille,
      |  CAST(floor(least(n_chars / 400.0, 1.0) * 1000.0) AS BIGINT)
      |    AS w_mille
      |  FROM documents)
      |SELECT doc_id, mille, w_mille FROM h
      |WHERE mille < w_mille ORDER BY doc_id""".stripMargin

  /** Leakage-aware split re-derived: the SAME recursive-CTE cluster
    * closure as [[dedupClustersSql]] gives each doc its near-dup
    * representative (own id when unclustered), then the MINSTD mille
    * of the REP decides the split — mirroring
    * [[graft.ops.Sampling.splitAssign]]. */

  val eventsWindowSql: String =
    s"""WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_type, value
       |  FROM events)
       |SELECT CAST(us - us % 3600000000 AS BIGINT) AS window_start_us,
       |event_type, count(*) AS cnt, ${sig("avg(value)")} AS avg_value,
       |min(value) AS min_value, max(value) AS max_value
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** [[graft.ops.EventOps.trendByType]] mirror: identical two-pass
    * central fit — sig5-rounded means as the shared centering
    * literals, then centered cross-product sums. */

  def planesValues(planes: Array[Array[Double]]): String =
    planes.zipWithIndex.flatMap { case (p, j) =>
      p.zipWithIndex.map { case (w, d) => s"($j, ${d + 1}, $w)" }
    }.mkString(", ")

  val embedAnnLshSql: String = {
    val cosExpr = sig("dp / (na.nrm * nb.nrm)")
    val pv = planesValues(Similarity.hyperplanes(8, 64))
    s"""WITH planes(pj, i, w) AS (VALUES $pv),
       |el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |       FROM embeddings, range(1, 65) t(i)),
       |proj AS (SELECT e.vec_id, p.pj, sum(e.v * p.w) AS pr
       |         FROM el e JOIN planes p ON p.i = e.i GROUP BY 1, 2),
       |bkt AS (SELECT vec_id,
       |        CAST(sum(CASE WHEN pr >= 1e-12
       |          THEN CAST(1 AS BIGINT) << pj
       |          ELSE 0 END) AS BIGINT) AS bucket
       |        FROM proj GROUP BY 1),
       |q AS (SELECT vec_id AS qid, bucket AS qb FROM bkt WHERE vec_id < 5),
       |probes AS (SELECT qid, CASE WHEN t.j = 8 THEN qb
       |             ELSE xor(qb, CAST(1 AS BIGINT) << t.j) END AS pb
       |           FROM q, range(0, 9) t(j)),
       |cand AS (SELECT p.qid, b.vec_id AS vid FROM probes p
       |         JOIN bkt b ON b.bucket = p.pb WHERE b.vec_id <> p.qid),
       |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM el GROUP BY vec_id),
       |dot AS (SELECT c.qid, c.vid, sum(a.v * b.v) AS dp
       |        FROM cand c JOIN el a ON a.vec_id = c.qid
       |        JOIN el b ON b.vec_id = c.vid AND b.i = a.i
       |        GROUP BY 1, 2),
       |cos AS (SELECT qid, vid, $cosExpr AS cosine
       |        FROM dot JOIN nrm na ON na.vec_id = dot.qid
       |        JOIN nrm nb ON nb.vec_id = dot.vid)
       |SELECT query_id, rnk, neighbor_id, cosine FROM (
       |  SELECT qid AS query_id,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS BIGINT) AS rnk,
       |    vid AS neighbor_id, cosine FROM cos)
       |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
  }

  /** [[graft.ops.TextStats.repetitionNgrams]] mirror: string n-grams
    * with full multiplicity (counts are hash-invariant absent
    * collisions — the text_repetition precedent), one UNION branch
    * per n. range(1, len−n+2) is empty when the doc is shorter than
    * n, so those docs are absent for that n exactly as in Spark. */

  def assocPairSql(table: String, a: String, b: String): String = {
    val vGuard = "least(card_a, card_b) > 1 AND greatest(card_a, card_b) <= 10000"
    val uGuard = "greatest(card_a, card_b) <= 10000"
    s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
       |CAST(card_a AS BIGINT) AS card_a, CAST(card_b AS BIGINT) AS card_b,
       |${sig(s"CASE WHEN $vGuard THEN sqrt(greatest((sumsq - 1) / (least(card_a, card_b) - 1), 0)) END")} AS cramers_v,
       |${sig(s"CASE WHEN $uGuard AND card_a > 1 THEN ((ln(n) - rlr / n) - (clc - nln) / n) / greatest(ln(n) - rlr / n, 1e-12) END")} AS theils_u_ab,
       |${sig(s"CASE WHEN $uGuard AND card_b > 1 THEN ((ln(n) - clc / n) - (rlr - nln) / n) / greatest(ln(n) - clc / n, 1e-12) END")} AS theils_u_ba
       |FROM (
       |  SELECT sum(nij) AS n,
       |    count(DISTINCT va)
       |      + max(CASE WHEN va IS NULL THEN 1 ELSE 0 END) AS card_a,
       |    count(DISTINCT vb)
       |      + max(CASE WHEN vb IS NULL THEN 1 ELSE 0 END) AS card_b,
       |    sum(nij * nij / (ri * cj)) AS sumsq,
       |    sum(nij * ln(nij)) AS nln,
       |    sum(nij * ln(cj)) AS clc,
       |    sum(nij * ln(ri)) AS rlr
       |  FROM (
       |    SELECT va, vb, nij,
       |      sum(nij) OVER (PARTITION BY va) AS ri,
       |      sum(nij) OVER (PARTITION BY vb) AS cj
       |    FROM (SELECT $a AS va, $b AS vb,
       |          CAST(count(*) AS DOUBLE) AS nij
       |          FROM $table GROUP BY 1, 2)))""".stripMargin
  }

  /** Equi-depth histogram re-derived: quantile_cont edges (proven
    * interpolation-identical to Spark's exact `percentile` by the
    * num_quantiles gates), bin = #rounded-edges ≤ v — the same
    * rounded-edge decision [[graft.profiler.Stats.eqDepthHistogram]]
    * makes. */

  val embedKmeansSql: String = {
    val score = sig("cn2 - 2 * dp")
    s"""WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |       FROM embeddings, range(1, 65) t(i)),
       |vn AS (SELECT vec_id, sum(v * v) AS vn2 FROM el GROUP BY vec_id),
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
       |c1 AS (SELECT a0.cid, el.i, avg(el.v) AS w FROM el
       |       JOIN a0 ON a0.vid = el.vec_id GROUP BY 1, 2),
       |cn1 AS (SELECT cid, sum(w * w) AS cn2 FROM c1 GROUP BY cid),
       |d1 AS (SELECT e.vec_id AS vid, c.cid, sum(e.v * c.w) AS dp
       |       FROM el e JOIN c1 c ON c.i = e.i GROUP BY 1, 2),
       |s1 AS (SELECT vid, d1.cid, $score AS score
       |       FROM d1 JOIN cn1 ON cn1.cid = d1.cid),
       |a1 AS (SELECT vid, cid, score FROM (
       |  SELECT vid, cid, score, row_number() OVER (PARTITION BY vid
       |    ORDER BY score ASC, cid ASC) AS rn FROM s1) WHERE rn = 1)
       |SELECT cid AS cluster_id, count(*) AS n_members,
       |${sig("sum(score + vn2)")} AS wcss
       |FROM a1 JOIN vn ON vn.vec_id = a1.vid
       |GROUP BY cid ORDER BY cluster_id""".stripMargin
  }

  /** The convergence trajectory re-derived: [[embedKmeansSql]]'s
    * unrolled iterations with the assignment score carried through
    * both rounds — per-iteration inertia = the wcss formula over that
    * round's assignment, center_shift = Σ (c1 − c0)² joined on
    * (cid, dim) for the surviving centroids (NULL on round 1). */

  val textChunkSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
      |             FROM documents),
      |st AS (SELECT doc_id, ts,
      |       unnest(range(0, len(ts), 48)) AS start FROM tok)
      |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
      |CAST(least(len(ts) - start, 64) AS BIGINT) AS n_tokens,
      |array_to_string(ts[start + 1 : start + 64], ' ') AS chunk_text
      |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  /** The surrogate weight model re-derived relationally: MINSTD of
    * the corpus token count mapped to [−1, 1] (same BIGINT chain as
    * [[sampleWeightedSql]]), sigmoid of the per-doc mean; the keep
    * decision ranks the sig5-rounded score on both engines. */

  def minstdHashSql(x: String): String = {
    val m = "2147483647"; val a = "48271"
    val h0 = s"((((CAST($x AS BIGINT) + 12345) % $m) + $m) % $m)"
    val h1 = s"(($h0 * $a) % $m)" // h0 ≥ 0, so % IS pmod from here
    s"(($h1 * $a) % $m)"
  }

  /** Bottom-k containment re-derived VALUE-LEVEL: because the key
    * hash is pure integer arithmetic, DuckDB rebuilds the identical
    * SA/SB/merged sketches (ORDER BY h LIMIT k over DISTINCT hashes
    * = the BottomK aggregate's set property) and lands on the same
    * estimate — the error contract is checked, not declared. */

}
