package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops._
import graft.pipeline.CorpusPipeline

/** Drift / monitoring queries. Split from the monolithic Extensions
  * registry (round 11) — pure move, zero behavior; every
  * query keeps its DuckDB oracle. */
object DriftQueries {

  import Shared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // distribution drift between the even/odd doc_id slices: PSI +
    // TVD over the language mix and the 10-bin length histogram
    // sliced monitoring: WHICH source drifted — per-group PSI/TVD
    // with per-group bins, all groups in one pass
    "drift_psi_by_source" -> ((s, dir) =>
      Drift.numericDriftByGroup(t(s, dir, "documents"), "source",
        col("n_chars"), pmod(col("doc_id"), lit(2L)))),
    // grouped KS: which source's WHOLE length distribution moved
    "drift_ks_by_source" -> ((s, dir) =>
      Drift.ksDriftByGroup(t(s, dir, "documents"), "source",
        col("n_chars"), pmod(col("doc_id"), lit(2L)))),
    "drift_psi" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val slice = pmod(col("doc_id"), lit(2L))
      Drift.categoricalDrift(d, "lang", col("lang"), slice)
        .unionByName(
          Drift.numericDrift(d, "n_chars", col("n_chars"), slice))
        .orderBy("dim")
    }),
    // did the quality GATE's behavior shift between slices: PSI/TVD
    // of the first-failing-rule distribution (a rule that suddenly
    // eats a feed moves this even when corpus volume stays flat)
    "drift_filter_reasons" -> ((s, dir) =>
      Drift.categoricalDrift(
        QualityRules.ruleAssign(t(s, dir, "documents"), "doc_id",
          "text", 30L, 90L, 3.8, 5.0, 2L, 0.12),
        "filter_rule", col("rule_idx"),
        pmod(col("doc_id"), lit(2L)))),
    // WHICH source changed its language mix: per-source TVD between
    // the slices' lang distributions (grouped twin of drift_vocab's
    // one global row)
    "drift_lang_by_source" -> ((s, dir) =>
      Drift.categoricalDriftByGroup(t(s, dir, "documents"), "source",
        col("lang"), pmod(col("doc_id"), lit(2L)).cast("int"))),
    // information-content drift between the even/odd doc slices —
    // moves when a template flood or language-mix shift hits, even
    // if per-value count drift stays flat
    "drift_entropy" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextStats.entropyDrift(
        d.where(col("doc_id") % 2 === 0),
        d.where(col("doc_id") % 2 === 1), "text")
    }),
    // binned two-sample KS statistic over the even/odd doc_id slices
    "drift_ks" -> ((s, dir) =>
      Drift.ksDrift(t(s, dir, "documents"), "n_chars", col("n_chars"),
        pmod(col("doc_id"), lit(2L)), bins = 20)),
    // vocabulary-mix drift: PSI/TVD over the TOKEN distribution of
    // the two slices — the "did the crawl's language change" check
    // one level below the lang column; reuses categoricalDrift with
    // tokens as buckets (one explode + one conditional-sum agg)
    "drift_vocab" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Drift.categoricalDrift(
        d.select(explode(TextStats.tokens(col("text"))).as("tok"),
          pmod(col("doc_id"), lit(2L)).as("sl")),
        "token_mix", col("tok"), col("sl"))
    }),
    // per-quantile drift: exact per-slice quantiles of doc length and
    // their gaps — the readout PSI's single number hides
    "drift_quantiles" -> ((s, dir) =>
      Drift.quantileDrift(t(s, dir, "documents"), "n_chars",
        col("n_chars"), pmod(col("doc_id"), lit(2L)))),
    // per-source quantile drift: WHOSE P90 moved, one grouped agg
    "drift_quantiles_by_source" -> ((s, dir) =>
      Drift.quantileDriftByGroup(t(s, dir, "documents"), "source",
        col("n_chars"), pmod(col("doc_id"), lit(2L)))),
    // embedding-space drift: centroid shift between the even/odd
    // vector slices — the continuous twin of the categorical drifts
    "drift_embedding" -> ((s, dir) =>
      Drift.embeddingDrift(
        t(s, dir, "embeddings").where(col("vec_id") < 2000L),
        "embedding", col("embedding"), pmod(col("vec_id"), lit(2L)),
        dims = 64)),
    "drift_reference" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val refCounts = d
        .where(col("doc_id") % 2 === 0 && col("lang").isNotNull)
        .groupBy("lang").agg(count(lit(1)).as("c"))
        .orderBy("lang").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      Drift.referenceDrift(d.where(col("doc_id") % 2 === 1),
        "lang_ref", col("lang"), refCounts)
    })
  )

  val driftLangBySourceSql: String =
    s"""WITH c AS (SELECT source, lang AS b,
       |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
       |    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
       |  FROM documents GROUP BY 1, 2),
       |t AS (SELECT source, CAST(sum(ca) AS DOUBLE) AS na,
       |    CAST(sum(cb) AS DOUBLE) AS nb,
       |    CAST(count(*) AS DOUBLE) AS k
       |  FROM c GROUP BY source),
       |s AS (SELECT c.source,
       |    (ca + 0.5) / (na + 0.5 * k) AS p,
       |    (cb + 0.5) / (nb + 0.5 * k) AS q, na, nb
       |  FROM c JOIN t ON t.source = c.source)
       |SELECT source, CAST(min(na) AS BIGINT) AS n_ref,
       |  CAST(min(nb) AS BIGINT) AS n_cur,
       |  CASE WHEN min(na) > 0 AND min(nb) > 0
       |    THEN ${sig("sum(abs(p - q)) / 2.0")} END AS tvd
       |FROM s GROUP BY source ORDER BY source""".stripMargin

  val driftEntropySql: String = {
    def side(p: String, pred: String): String =
      s"""${p}c AS (SELECT g, count(*) AS c FROM (
         |    SELECT unnest(string_split(text, ' ')) AS g
         |    FROM documents WHERE text IS NOT NULL AND $pred)
         |  GROUP BY g),
         |$p AS (SELECT CAST(sum(c) AS BIGINT) AS tot,
         |  ${sig("log2(CAST(sum(c) AS DOUBLE)) - sum(c * log2(c)) / CAST(sum(c) AS DOUBLE)")}
         |    AS h FROM ${p}c)""".stripMargin
    s"""WITH ${side("er", "doc_id % 2 = 0")},
       |${side("ec", "doc_id % 2 = 1")}
       |SELECT er.tot AS n_tokens_ref, ec.tot AS n_tokens_cur,
       |  er.h AS h_ref, ec.h AS h_cur,
       |  ${sig("ec.h - er.h")} AS delta_bits
       |FROM er, ec""".stripMargin
  }

  private def driftDimSql(dim: String, src: String, bucketExpr: String)
      : String =
    s"""SELECT '$dim' AS dim, CAST(min(na) AS BIGINT) AS n_a,
       |CAST(min(nb) AS BIGINT) AS n_b,
       |CAST(min(k) AS BIGINT) AS n_buckets,
       |${sig("sum((p - q) * ln(p / q))")} AS psi,
       |${sig("sum(abs(p - q)) / 2.0")} AS tvd
       |FROM (
       |  SELECT (ca + 0.5) / (na + 0.5 * k) AS p,
       |         (cb + 0.5) / (nb + 0.5 * k) AS q, na, nb, k
       |  FROM (SELECT $bucketExpr AS b,
       |          sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
       |          sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
       |        FROM $src GROUP BY 1) c,
       |       -- totals from the counts themselves (a NULL bucket is a
       |       -- regular category, exactly like the Spark groupBy)
       |       (SELECT CAST(sum(ca) AS DOUBLE) AS na,
       |        CAST(sum(cb) AS DOUBLE) AS nb,
       |        CAST(count(*) AS DOUBLE) AS k
       |        FROM (SELECT $bucketExpr AS b,
       |                sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
       |                sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
       |              FROM $src GROUP BY 1)) t)
       |-- empty-dimension guard: Spark's groupBy emits ZERO rows for
       |-- an empty input, while a bare aggregate here would emit one
       |-- all-NULL row — drop it so both engines agree
       |HAVING count(*) > 0""".stripMargin

  val driftPsiBySourceSql: String = {
    val binExpr =
      """CASE WHEN mm.w > 0 THEN
        |  CAST(least(floor((CAST(n_chars AS DOUBLE) - mm.mn) / mm.w),
        |    9) AS BIGINT) ELSE 0 END""".stripMargin
    s"""WITH mm AS (SELECT source AS g,
       |  min(CAST(n_chars AS DOUBLE)) AS mn,
       |  (max(CAST(n_chars AS DOUBLE)) - min(CAST(n_chars AS DOUBLE)))
       |    / 10.0 AS w
       |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
       |binned AS (SELECT d.doc_id, d.source AS g, $binExpr AS b
       |           FROM documents d JOIN mm ON mm.g = d.source
       |           WHERE n_chars IS NOT NULL),
       |c AS (SELECT g, b,
       |        sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
       |        sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
       |      FROM binned GROUP BY 1, 2),
       |t AS (SELECT g, CAST(sum(ca) AS DOUBLE) AS na,
       |        CAST(sum(cb) AS DOUBLE) AS nb,
       |        CAST(count(*) AS DOUBLE) AS k
       |      FROM c GROUP BY 1),
       |sh AS (SELECT c.g, (ca + 0.5) / (na + 0.5 * k) AS p,
       |         (cb + 0.5) / (nb + 0.5 * k) AS q, na, nb, k
       |       FROM c JOIN t ON t.g = c.g)
       |SELECT g AS source, CAST(min(na) AS BIGINT) AS n_a,
       |CAST(min(nb) AS BIGINT) AS n_b,
       |CAST(min(k) AS BIGINT) AS n_buckets,
       |${sig("sum((p - q) * ln(p / q))")} AS psi,
       |${sig("sum(abs(p - q)) / 2.0")} AS tvd
       |FROM sh GROUP BY g ORDER BY source""".stripMargin
  }

  val driftPsiSql: String = {
    val ncharsBin =
      """CASE WHEN mm.w > 0 THEN
        |  CAST(least(floor((CAST(n_chars AS DOUBLE) - mm.mn) / mm.w),
        |    9) AS BIGINT) ELSE 0 END""".stripMargin
    s"""WITH mm AS (SELECT min(CAST(n_chars AS DOUBLE)) AS mn,
       |  (max(CAST(n_chars AS DOUBLE)) - min(CAST(n_chars AS DOUBLE)))
       |    / 10.0 AS w
       |  FROM documents WHERE n_chars IS NOT NULL),
       |binned AS (SELECT doc_id, $ncharsBin AS b
       |           FROM documents, mm WHERE n_chars IS NOT NULL)
       |SELECT * FROM (
       |${driftDimSql("lang", "documents", "lang")}
       |UNION ALL
       |${driftDimSql("n_chars", "binned", "b")}
       |) ORDER BY dim""".stripMargin
  }

  /** Quotas from scale = min(avail/weight) — every float step is a
    * single IEEE op on identical operands in both engines, so the
    * floor() quota needs no rounding contract. */

  val driftKsBySourceSql: String =
    s"""WITH mm AS (SELECT source AS g,
       |  min(CAST(n_chars AS DOUBLE)) AS mn,
       |  (max(CAST(n_chars AS DOUBLE)) - min(CAST(n_chars AS DOUBLE)))
       |    / 20.0 AS w
       |  FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
       |bn AS (SELECT d.source AS g, CASE WHEN mm.w > 0 THEN
       |    CAST(least(floor((CAST(n_chars AS DOUBLE) - mm.mn) / mm.w),
       |      19) AS BIGINT) ELSE 0 END AS b,
       |    doc_id % 2 AS s
       |  FROM documents d JOIN mm ON mm.g = d.source
       |  WHERE n_chars IS NOT NULL),
       |c AS (SELECT g, b,
       |    sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
       |    sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
       |  FROM bn GROUP BY g, b),
       |cum AS (SELECT g, b,
       |    sum(ca) OVER (PARTITION BY g) AS na,
       |    sum(cb) OVER (PARTITION BY g) AS nb,
       |    sum(ca) OVER (PARTITION BY g ORDER BY b ROWS BETWEEN
       |      UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
       |    sum(cb) OVER (PARTITION BY g ORDER BY b ROWS BETWEEN
       |      UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
       |  FROM c)
       |SELECT g AS source, CAST(min(na) AS BIGINT) AS n_a,
       |  CAST(min(nb) AS BIGINT) AS n_b,
       |${sig("max(abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb))")}
       |  AS ks
       |FROM cum GROUP BY g ORDER BY source""".stripMargin

  val driftKsSql: String =
    s"""WITH mm AS (SELECT min(CAST(n_chars AS DOUBLE)) AS mn,
       |  (max(CAST(n_chars AS DOUBLE)) - min(CAST(n_chars AS DOUBLE)))
       |    / 20.0 AS w
       |  FROM documents WHERE n_chars IS NOT NULL),
       |bn AS (SELECT CASE WHEN mm.w > 0 THEN
       |    CAST(least(floor((CAST(n_chars AS DOUBLE) - mm.mn) / mm.w),
       |      19) AS BIGINT) ELSE 0 END AS b,
       |    doc_id % 2 AS s
       |  FROM documents, mm WHERE n_chars IS NOT NULL),
       |c AS (SELECT b,
       |    sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
       |    sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
       |  FROM bn GROUP BY b),
       |cum AS (SELECT b, sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
       |    sum(ca) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS cuma,
       |    sum(cb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS cumb
       |  FROM c)
       |SELECT 'n_chars' AS dim, CAST(min(na) AS BIGINT) AS n_a,
       |  CAST(min(nb) AS BIGINT) AS n_b,
       |${sig("max(abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb))")}
       |  AS ks
       |FROM cum""".stripMargin

  /** Concat-and-split packing re-derived: same chunking CTE shape as
    * [[textChunkSql]] at stride = size, per-shard running sums. */

  val driftQuantilesSql: String =
    s"""WITH b AS (SELECT CAST(n_chars AS DOUBLE) AS v, doc_id % 2 AS s
       |           FROM documents WHERE n_chars IS NOT NULL),
       |q AS (SELECT
       |   quantile_cont(CASE WHEN s = 0 THEN v END,
       |     [0.1, 0.25, 0.5, 0.75, 0.9]) AS qa,
       |   quantile_cont(CASE WHEN s = 1 THEN v END,
       |     [0.1, 0.25, 0.5, 0.75, 0.9]) AS qb,
       |   count(v) AS n FROM b)
       |SELECT 'n_chars' AS dim,
       |CAST(([0.1, 0.25, 0.5, 0.75, 0.9])[i] AS DOUBLE) AS p,
       |${sig("qa[i]")} AS q_a, ${sig("qb[i]")} AS q_b,
       |${sig("qb[i] - qa[i]")} AS gap
       |FROM q, range(1, 6) t(i) WHERE n > 0 ORDER BY p""".stripMargin

  /** Grouped mirror of [[driftQuantilesSql]]: quantile_cont over the
    * slice CASE projections per source. */

  val driftQuantilesBySourceSql: String =
    s"""WITH b AS (SELECT source AS g, CAST(n_chars AS DOUBLE) AS v,
       |           doc_id % 2 AS s
       |           FROM documents WHERE n_chars IS NOT NULL),
       |q AS (SELECT g,
       |   quantile_cont(CASE WHEN s = 0 THEN v END,
       |     [0.1, 0.25, 0.5, 0.75, 0.9]) AS qa,
       |   quantile_cont(CASE WHEN s = 1 THEN v END,
       |     [0.1, 0.25, 0.5, 0.75, 0.9]) AS qb,
       |   count(v) AS n FROM b GROUP BY g)
       |SELECT g AS source,
       |CAST(([0.1, 0.25, 0.5, 0.75, 0.9])[i] AS DOUBLE) AS p,
       |${sig("qa[i]")} AS q_a, ${sig("qb[i]")} AS q_b,
       |${sig("qb[i] - qa[i]")} AS gap
       |FROM q, range(1, 6) t(i) WHERE n > 0 ORDER BY source, p""".stripMargin

  /** BPE pair counts re-derived with character-based substring on
    * both engines. */

  val driftEmbeddingSql: String =
    s"""WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v,
       |        vec_id % 2 AS s
       |      FROM embeddings, range(1, 65) t(i)
       |      WHERE vec_id < 2000 AND len(embedding) = 64),
       |pd AS (SELECT i,
       |        sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
       |        sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb,
       |        sum(CASE WHEN s = 0 THEN v ELSE 0 END) AS sa,
       |        sum(CASE WHEN s = 1 THEN v ELSE 0 END) AS sb
       |      FROM el GROUP BY 1),
       |m AS (SELECT ca, cb,
       |        CASE WHEN ca > 0 THEN sa / ca END AS ma,
       |        CASE WHEN cb > 0 THEN sb / cb END AS mb FROM pd)
       |SELECT 'embedding' AS dim, CAST(min(ca) AS BIGINT) AS n_a,
       |CAST(min(cb) AS BIGINT) AS n_b,
       |${sig("sqrt(sum((ma - mb) * (ma - mb)))")} AS l2,
       |${sig("CASE WHEN sqrt(sum(ma * ma)) * sqrt(sum(mb * mb)) > 0 " +
          "THEN sum(ma * mb) / (sqrt(sum(ma * ma)) * " +
          "sqrt(sum(mb * mb))) END")} AS centroid_cos,
       |${sig("max(abs(ma - mb))")} AS max_dim_gap
       |FROM m HAVING min(ca) IS NOT NULL""".stripMargin

  /** Guard recall gate: the exact ≥1-shared-gram train set with TRUE
    * literals — the Bloom flag has no false negatives, so a false
    * flag anywhere fails the hash compare. */

  val driftReferenceSql: String =
    s"""WITH ref AS (SELECT lang AS b, count(*) AS c FROM documents
       |       WHERE doc_id % 2 = 0 AND lang IS NOT NULL GROUP BY 1),
       |mt AS (SELECT CAST(sum(c) AS DOUBLE) AS na,
       |       CAST(count(*) + 1 AS DOUBLE) AS k FROM ref),
       |cand AS (SELECT CASE WHEN lang IN (SELECT b FROM ref)
       |           THEN lang ELSE '__other__' END AS b, count(*) AS c
       |         FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
       |nbt AS (SELECT CAST(COALESCE(sum(c), 0) AS DOUBLE) AS nb
       |        FROM cand),
       |bk AS (SELECT b, c, 0 AS iso FROM ref
       |       UNION ALL SELECT '__other__', 0, 1),
       |sh AS (SELECT bk.b, bk.iso,
       |         (CAST(bk.c AS DOUBLE) + 0.5) / (mt.na + 0.5 * mt.k)
       |           AS p,
       |         (CAST(COALESCE(cand.c, 0) AS DOUBLE) + 0.5)
       |           / (nbt.nb + 0.5 * mt.k) AS q,
       |         mt.na AS na, nbt.nb AS nb, mt.k AS k
       |       FROM bk CROSS JOIN mt CROSS JOIN nbt
       |       LEFT JOIN cand ON cand.b = bk.b),
       |cum AS (SELECT *, sum(p) OVER w AS pc, sum(q) OVER w AS qc
       |        FROM sh WINDOW w AS (ORDER BY iso, b
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT 'lang_ref' AS dim, CAST(min(na) AS BIGINT) AS n_a,
       |CAST(min(nb) AS BIGINT) AS n_b,
       |CAST(min(k) AS BIGINT) AS n_buckets,
       |${sig("sum((p - q) * ln(p / q))")} AS psi,
       |${sig("sum(abs(p - q)) / 2.0")} AS tvd,
       |${sig("max(abs(pc - qc))")} AS ks
       |FROM cum""".stripMargin

  /** Token-distribution drift via the shared per-dim CTE (tokens as
    * buckets). */

  /** Rule-distribution drift: the drift template over the shared
    * (doc_id, rule_idx) subquery — same rule CASE as the funnel
    * oracles ([[TextQueries.ruleIdxSubquery]]). */
  val driftFilterReasonsSql: String = driftDimSql("filter_rule",
    TextQueries.ruleIdxSubquery, "rule_idx")

  val driftVocabSql: String = driftDimSql("token_mix",
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
      "FROM documents)", "tok")

  /** Quality-quota selection: textQualitySql's score formula ranked
    * per language, top 5, rounded-score ordering. */

  val oracle: Map[String, String] = Map(
    "drift_vocab" -> driftVocabSql,
    "drift_filter_reasons" -> driftFilterReasonsSql,
    "drift_reference" -> driftReferenceSql,
    "drift_quantiles" -> driftQuantilesSql,
    "drift_embedding" -> driftEmbeddingSql,
    "drift_ks" -> driftKsSql,
    "drift_ks_by_source" -> driftKsBySourceSql,
    "drift_quantiles_by_source" -> driftQuantilesBySourceSql,
    "drift_psi" -> driftPsiSql,
    "drift_psi_by_source" -> driftPsiBySourceSql,
    "drift_entropy" -> driftEntropySql,
    "drift_lang_by_source" -> driftLangBySourceSql
  )
}
