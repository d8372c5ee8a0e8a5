package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops.{Corpus, Privacy}

/** Corpus-assembly + privacy-audit queries (round 10, session 5):
  * cross-source gram overlap (exact + KMV sketch), token-budget
  * planning, the reproducible training-order shuffle, and the
  * k-anonymity / l-diversity release gate. All oracles are full
  * value-level replays — every hash involved (md5-60bit, MINSTD) is
  * portable integer arithmetic DuckDB re-derives exactly. */
object CorpusQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def sig(x: String) = Sig.sql(x)

  /** Target mixture for the budget plan (shared with the oracle's
    * VALUES list); sources beyond these four get weight 0. */
  val BudgetWeights: Map[String, Double] =
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
  val BudgetTokens = 200000L

  val OverlapK = 128

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pairwise source gram-set overlap: every (a < b) pair with
    // jaccard + both containments, zeros included
    "corpus_overlap" -> ((s, dir) =>
      Corpus.sourceOverlap(t(s, dir, "documents"), "source", "text")),
    // KMV-sketch twin: S·k signature rows instead of the gram sets
    "corpus_overlap_sketch" -> ((s, dir) =>
      Corpus.sourceOverlapSketch(t(s, dir, "documents"), "source",
        "text", n = 3, k = OverlapK)),
    // token-budget plan against the target mixture
    "corpus_budget" -> ((s, dir) =>
      Corpus.tokenBudget(t(s, dir, "documents"), "source", "text",
        BudgetWeights, BudgetTokens)),
    // reproducible (shard, pos) training order from ids alone
    "corpus_shuffle" -> ((s, dir) =>
      Corpus.reproducibleShuffle(t(s, dir, "documents"), "doc_id",
        shards = 8)),
    // k-anonymity over the (segment, nation) quasi-identifier
    "privacy_k_anon" -> ((s, dir) =>
      Privacy.kAnonymity(t(s, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"), k = 10L)),
    // l-diversity of the coarsened balance within each QI group
    "privacy_l_diversity" -> ((s, dir) =>
      Privacy.lDiversity(t(s, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"),
        floor(col("c_acctbal") / 2000.0).cast("long"), l = 5L)),
    // suppression cost of a k-anonymous release across candidate ks
    "privacy_risk_curve" -> ((s, dir) =>
      Privacy.riskCurve(t(s, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"), Seq(2L, 5L, 8L, 10L, 15L, 25L)))
  )

  // ------------------------- oracle SQL ---------------------------- //

  /** Per-source distinct gram-hash CTE `<p>` (word 3-grams, md5
    * folded to 60 bits) — the oracle-side mirror of
    * [[Corpus.sourceOverlap]]'s gram sets. */
  private def srcGramCte(p: String): String =
    s"""$p AS (
       |  SELECT DISTINCT source,
       |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM (
       |    SELECT source, unnest(list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
       |    FROM (SELECT source, string_split(text, ' ') AS w
       |          FROM documents)))""".stripMargin

  val corpusOverlapSql: String =
    s"""WITH ${srcGramCte("sh")},
       |sz0 AS (SELECT source, count(*) AS sz FROM sh GROUP BY source),
       |srcs AS (SELECT DISTINCT source FROM documents
       |         WHERE source IS NOT NULL),
       |sz AS (SELECT srcs.source, coalesce(sz0.sz, 0) AS sz
       |       FROM srcs LEFT JOIN sz0 ON sz0.source = srcs.source),
       |pr AS (SELECT a.source AS src_a, b.source AS src_b,
       |         count(*) AS n_common
       |       FROM sh a JOIN sh b
       |         ON a.h = b.h AND a.source < b.source
       |       GROUP BY 1, 2),
       |pp AS (SELECT sa.source AS src_a, sb.source AS src_b,
       |         sa.sz AS sz_a, sb.sz AS sz_b
       |       FROM sz sa JOIN sz sb ON sa.source < sb.source),
       |j AS (SELECT pp.src_a, pp.src_b, pp.sz_a, pp.sz_b,
       |        coalesce(pr.n_common, 0) AS n_common
       |      FROM pp LEFT JOIN pr
       |        ON pr.src_a = pp.src_a AND pr.src_b = pp.src_b)
       |SELECT src_a, src_b, CAST(sz_a AS BIGINT) AS sz_a,
       |  CAST(sz_b AS BIGINT) AS sz_b, n_common,
       |  ${sig("CASE WHEN sz_a + sz_b - n_common > 0 THEN CAST(n_common AS DOUBLE) / (sz_a + sz_b - n_common) END")}
       |    AS jaccard,
       |  ${sig("CASE WHEN sz_a > 0 THEN CAST(n_common AS DOUBLE) / sz_a END")} AS c_a,
       |  ${sig("CASE WHEN sz_b > 0 THEN CAST(n_common AS DOUBLE) / sz_b END")} AS c_b
       |FROM j ORDER BY src_a, src_b""".stripMargin

  val corpusOverlapSketchSql: String =
    s"""WITH ${srcGramCte("sh")},
       |sg AS (SELECT source, h FROM (
       |         SELECT source, h, row_number() OVER (
       |           PARTITION BY source ORDER BY h) AS rn FROM sh)
       |       WHERE rn <= $OverlapK),
       |pp AS (SELECT a.source AS src_a, b.source AS src_b
       |       FROM (SELECT DISTINCT source FROM documents
       |             WHERE source IS NOT NULL) a
       |       JOIN (SELECT DISTINCT source FROM documents
       |             WHERE source IS NOT NULL) b
       |         ON a.source < b.source),
       |u AS (SELECT src_a, src_b, h,
       |        max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |        SELECT pp.src_a, pp.src_b, sg.h, 1 AS in_a, 0 AS in_b
       |        FROM pp JOIN sg ON sg.source = pp.src_a
       |        UNION ALL
       |        SELECT pp.src_a, pp.src_b, sg.h, 0 AS in_a, 1 AS in_b
       |        FROM pp JOIN sg ON sg.source = pp.src_b)
       |      GROUP BY 1, 2, 3),
       |rk AS (SELECT *, row_number() OVER (
       |         PARTITION BY src_a, src_b ORDER BY h) AS rn FROM u),
       |est AS (SELECT src_a, src_b, count(*) AS k_used,
       |          sum(CASE WHEN in_a = 1 AND in_b = 1
       |              THEN 1 ELSE 0 END) AS n_both
       |        FROM rk WHERE rn <= $OverlapK GROUP BY 1, 2),
       |j AS (SELECT pp.src_a, pp.src_b,
       |        coalesce(est.k_used, 0) AS k_used,
       |        CAST(coalesce(est.n_both, 0) AS BIGINT) AS n_both
       |      FROM pp LEFT JOIN est
       |        ON est.src_a = pp.src_a AND est.src_b = pp.src_b)
       |SELECT src_a, src_b, k_used, n_both,
       |  ${sig("CASE WHEN k_used > 0 THEN CAST(n_both AS DOUBLE) / k_used END")}
       |    AS est_jaccard
       |FROM j ORDER BY src_a, src_b""".stripMargin

  val corpusBudgetSql: String = {
    val vals = BudgetWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    s"""WITH c AS (SELECT source, count(*) AS n_docs,
       |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
       |           AS n_tokens
       |       FROM documents GROUP BY source),
       |w(source, wt) AS (VALUES $vals),
       |j AS (SELECT c.source, c.n_docs, c.n_tokens,
       |        coalesce(w.wt, 0.0) AS wt,
       |        CAST(floor(coalesce(w.wt, 0.0) * $BudgetTokens)
       |          AS BIGINT) AS target_tokens
       |      FROM c LEFT JOIN w ON w.source = c.source)
       |SELECT source, n_docs, n_tokens, ${sig("wt")} AS weight,
       |  target_tokens,
       |  ${sig("CAST(target_tokens AS DOUBLE) / n_tokens")} AS epochs
       |FROM j ORDER BY source""".stripMargin
  }

  private def minstdSql(x: String): String = {
    val m = "2147483647"; val a = "48271"
    val h0 = s"((((CAST($x AS BIGINT) + 12345) % $m) + $m) % $m)"
    val h1 = s"(($h0 * $a) % $m)"
    s"(($h1 * $a) % $m)"
  }

  val corpusShuffleSql: String =
    s"""WITH s AS (SELECT doc_id,
       |    ${minstdSql("doc_id")} % 8 AS shard,
       |    ${minstdSql(minstdSql("doc_id"))} AS ord
       |  FROM documents)
       |SELECT shard,
       |  CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY ord, doc_id) AS BIGINT) AS pos, doc_id
       |FROM s ORDER BY shard, pos""".stripMargin

  val privacyKAnonSql: String =
    s"""WITH g AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
       |           FROM customer GROUP BY 1, 2)
       |SELECT c_mktsegment, c_nationkey, n,
       |  ${sig("1.0 / n")} AS risk, n < 10 AS at_risk
       |FROM g ORDER BY c_mktsegment, c_nationkey""".stripMargin

  val privacyLDiversitySql: String =
    s"""WITH p AS (SELECT c_mktsegment, c_nationkey,
       |             CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS sens,
       |             count(*) AS cnt
       |           FROM customer GROUP BY 1, 2, 3),
       |g AS (SELECT c_mktsegment, c_nationkey,
       |        count(*) AS l_distinct, sum(cnt) AS n
       |      FROM p GROUP BY 1, 2)
       |SELECT c_mktsegment, c_nationkey, CAST(n AS BIGINT) AS n,
       |  l_distinct, l_distinct < 5 AS at_risk
       |FROM g ORDER BY c_mktsegment, c_nationkey""".stripMargin

  val privacyRiskCurveSql: String =
    s"""WITH g AS (SELECT count(*) AS n FROM customer
       |           GROUP BY c_mktsegment, c_nationkey),
       |tot AS (SELECT sum(n) AS total FROM g),
       |ks(k) AS (VALUES (2), (5), (8), (10), (15), (25))
       |SELECT CAST(k AS BIGINT) AS k,
       |  CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
       |    AS groups_at_risk,
       |  CAST(coalesce(sum(CASE WHEN n < k THEN n END), 0) AS BIGINT)
       |    AS rows_at_risk,
       |  ${sig("CAST(coalesce(sum(CASE WHEN n < k THEN n END), 0) AS DOUBLE) / any_value(tot.total)")}
       |    AS share_at_risk
       |FROM ks CROSS JOIN g CROSS JOIN tot GROUP BY k
       |ORDER BY k""".stripMargin

  val oracle: Map[String, String] = Map(
    "corpus_overlap" -> corpusOverlapSql,
    "corpus_overlap_sketch" -> corpusOverlapSketchSql,
    "corpus_budget" -> corpusBudgetSql,
    "corpus_shuffle" -> corpusShuffleSql,
    "privacy_k_anon" -> privacyKAnonSql,
    "privacy_l_diversity" -> privacyLDiversitySql,
    "privacy_risk_curve" -> privacyRiskCurveSql
  )
}
