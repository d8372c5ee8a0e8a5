package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops.UrlOps

/** URL / domain-family queries (round 11): registrable-domain
  * datasheet + the per-domain doc cap — the first two operations a
  * crawl-pipeline user runs. The fixture URL column is synthesized
  * deterministically from doc_id ([[UrlOps.synthUrl]], the text_pii
  * precedent), so the DuckDB oracle re-derives the identical URLs,
  * hosts and domains with pure string/integer ops and replays both
  * queries value-level. */
object UrlQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def sig(x: String) = Sig.sql(x)

  val HotShare = 0.05
  // binds at gate scale: sf0.01 has 500 docs and the hot hub.com
  // domains hold ~44 each, so the cap genuinely truncates them
  val DomainCap = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-registrable-domain docs/tokens/hosts/share + hot flag
    "text_domains" -> ((s, dir) =>
      UrlOps.domainProfile(
        UrlOps.synthUrl(t(s, dir, "documents"), "doc_id"),
        "url", "text", HotShare)),
    // reproducible per-domain doc cap (minstd order, bounded heap —
    // the SMALL-cap audit form with ranks)
    "sample_domain_cap" -> ((s, dir) =>
      UrlOps.domainCap(
        UrlOps.synthUrl(t(s, dir, "documents"), "doc_id"),
        "url", "doc_id", DomainCap)),
    // the one-call corpus DATASHEET: composition, domain mix,
    // per-lang quality, duplication and PII exposure as one
    // long-format frame — every section an existing audited operator
    // re-shaped; the fixture synthesizes PII and URLs so no section
    // passes vacuously, and the oracle replays all five sections
    // over the same synthesized corpus
    "corpus_datasheet" -> ((s, dir) => {
      val d = UrlOps.synthUrl(
        graft.ops.Pii.synthPii(t(s, dir, "documents"), "doc_id",
          "text"), "doc_id")
      graft.ops.Datasheet.corpusDatasheet(d, urlCol = Some("url"),
        gate = Some(graft.ops.QualityRules.Thresholds(30L, 90L, 3.8,
          5.0, 2L, 0.12)), lrIters = Some(5),
        blocklist = Some(BlocklistQueries.Terms))
    }),
    // PageRank mass rolled up to registrable domains — "which
    // domains carry the link authority" (the per-domain rank a
    // crawl curator caps/boosts by): the graph family composed with
    // the URL fold, top-15 by sig5 rank mass with domain tie-break
    "graph_domain_rank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pr = graft.ops.GraphOps.pageRank(
        graft.ops.GraphOps.synthLinkGraph(docs, "doc_id"),
        "src", "dst", iters = 3)
      val dom = UrlOps.withDomain(UrlOps.synthUrl(docs, "doc_id"),
          "url")
        .select(col("doc_id").as("node"), col("domain"))
      pr.join(dom, Seq("node"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_pages"),
          Sig.sig5(sum("pr")).as("rank_mass"))
        .orderBy(col("rank_mass").desc, col("domain").asc)
        .limit(15)
    }),
    // domain-mix drift between the even/odd doc slices: PSI + TVD
    // over the registrable-domain distribution — "did the crawl's
    // composition change" one level above the lang column
    "drift_domains" -> ((s, dir) => {
      val d = UrlOps.withDomain(
        UrlOps.synthUrl(t(s, dir, "documents"), "doc_id"), "url")
      graft.ops.Drift.categoricalDrift(d, "domain_mix", col("domain"),
        pmod(col("doc_id"), lit(2L)))
    }),
    // per-domain quality datasheet: which domains feed garbage —
    // the domain fold joined to the text quality score, one
    // aggregation (avg quality + low-quality share per domain);
    // thresholds compare the sig5-rounded score on both engines
    "text_quality_by_domain" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val d = UrlOps.withDomain(UrlOps.synthUrl(docs, "doc_id"), "url")
      val q = graft.ops.TextStats.quality(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      d.select(col("doc_id"), col("domain")).join(q, Seq("doc_id"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          Sig.sig5(avg(col("quality"))).as("avg_quality"),
          Sig.sig5(sum(when(col("quality") < 0.5, 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("low_quality_share"))
        .orderBy("domain")
    }),
    // crawl-side URL junk filter with loud reason accounting over a
    // deliberately dirty fixture (deep paths, param spam, calendar
    // pages): the oracle re-derives the strings AND replays the
    // string rules, so the classifier must land every arm exactly
    "url_filter_stats" -> ((s, dir) =>
      UrlOps.urlFilterStats(
        UrlOps.synthUrlDirty(t(s, dir, "documents"), "doc_id"),
        "url")),
    // the LARGE-cap production twin: hash-bucket quota selection
    // (windows touch only the O(domains×buckets) histogram —
    // measured 7.5× vs the per-domain sort window at 100M docs with
    // a 90%-hot domain); kept set = first `cap` rows per domain
    // under (minstd-bucket, doc_id), which the oracle replays
    "sample_domain_cap_hash" -> ((s, dir) =>
      UrlOps.domainCapHash(
        UrlOps.synthUrl(t(s, dir, "documents"), "doc_id"),
        "url", "doc_id", DomainCap.toLong)
        .select(col("domain"), col("doc_id"))
        .orderBy("domain", "doc_id"))
  )

  // ------------------------- oracle SQL ---------------------------- //

  /** CTE `u`: the synthesized URL re-derived in DuckDB — mirrors
    * [[UrlOps.synthUrl]] integer-for-integer. */
  private val urlCte: String =
    """u AS (SELECT doc_id, text,
      |  'https://' ||
      |  CASE WHEN doc_id % 3 = 0 THEN 'www.'
      |       WHEN doc_id % 3 = 1 THEN 'cdn' || (doc_id % 5) || '.'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 10 < 4 THEN 'hub' || (doc_id % 2)
      |       ELSE 'site' || (doc_id % 97) END || '.' ||
      |  CASE WHEN doc_id % 7 <= 2 THEN 'com'
      |       WHEN doc_id % 7 <= 4 THEN 'org'
      |       WHEN doc_id % 7 = 5 THEN 'net' ELSE 'io' END ||
      |  '/p/' || (doc_id % 1000) ||
      |  CASE WHEN doc_id % 2 = 0 THEN '?ref=r' || (doc_id % 50)
      |       ELSE '' END AS url
      |  FROM documents)""".stripMargin

  /** CTE `h`: host (regex re-derivation of parse_url HOST) and the
    * last-two-labels registrable domain. */
  private val hostCte: String =
    """h AS (SELECT doc_id, text,
      |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host FROM u),
      |d AS (SELECT doc_id, text, host,
      |  hl[len(hl)-1] || '.' || hl[len(hl)] AS domain FROM (
      |  SELECT doc_id, text, host, string_split(host, '.') AS hl
      |  FROM h))""".stripMargin

  val textDomainsSql: String =
    s"""WITH $urlCte, $hostCte,
       |a AS (SELECT domain, count(*) AS n_docs,
       |        CAST(sum(len(string_split(text, ' '))) AS BIGINT)
       |          AS n_tokens,
       |        count(DISTINCT host) AS n_hosts
       |      FROM d GROUP BY domain),
       |s AS (SELECT domain, n_docs, n_tokens, n_hosts,
       |        CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS sh
       |      FROM a),
       |r AS (SELECT domain, n_docs, n_tokens, n_hosts,
       |        ${sig("sh")} AS doc_share FROM s)
       |SELECT domain, n_docs, n_tokens, n_hosts, doc_share,
       |  doc_share > $HotShare AS is_hot
       |FROM r ORDER BY domain""".stripMargin

  private def minstdSql(x: String): String = {
    val m = "2147483647"; val a = "48271"
    val h0 = s"((((CAST($x AS BIGINT) + 12345) % $m) + $m) % $m)"
    val h1 = s"(($h0 * $a) % $m)"
    s"(($h1 * $a) % $m)"
  }

  val sampleDomainCapSql: String =
    s"""WITH $urlCte, $hostCte,
       |r AS (SELECT domain, doc_id, row_number() OVER (
       |        PARTITION BY domain
       |        ORDER BY ${minstdSql("doc_id")} DESC, doc_id) AS rnk
       |      FROM d)
       |SELECT domain, CAST(rnk AS BIGINT) AS rnk, doc_id
       |FROM r WHERE rnk <= $DomainCap
       |ORDER BY domain, rnk""".stripMargin

  /** Hash-bucket quota replay: kept set = first `cap` rows per
    * domain under (minstd-bucket, doc_id) — equivalent by
    * construction to quotaSampleByHash's core+residual split. */
  val sampleDomainCapHashSql: String =
    s"""WITH $urlCte, $hostCte,
       |r AS (SELECT domain, doc_id, row_number() OVER (
       |        PARTITION BY domain
       |        ORDER BY ${minstdSql("doc_id")} % 8192, doc_id) AS rn
       |      FROM d)
       |SELECT domain, doc_id FROM r WHERE rn <= $DomainCap
       |ORDER BY domain, doc_id""".stripMargin

  /** Replays BOTH the dirty-URL synthesis and the string rules —
    * mirrors [[UrlOps.synthUrlDirty]] + [[UrlOps.urlFilterStats]]. */
  val urlFilterStatsSql: String =
    """WITH u AS (SELECT doc_id,
      |    'https://site' || (doc_id % 50) || '.com' ||
      |    CASE WHEN doc_id % 5 = 0 THEN '/a/b'
      |         WHEN doc_id % 5 = 1 THEN '/a/b/c/d/e/f'
      |         WHEN doc_id % 5 = 2 THEN
      |           '/p?sid=abc' || doc_id || '&ref=1&x=2'
      |         WHEN doc_id % 5 = 3 THEN '/cal/2020/01/' ||
      |           lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
      |         ELSE '/q?ref=r' || (doc_id % 9) END AS url
      |  FROM documents),
      |pq AS (SELECT regexp_replace(url, '^[a-z]+://[^/]+', '')
      |         AS pqv FROM u),
      |f AS (SELECT regexp_replace(pqv, '\?.*$', '') AS path,
      |        CASE WHEN contains(pqv, '?')
      |          THEN regexp_replace(pqv, '^[^?]*\?', '')
      |          ELSE '' END AS qs
      |      FROM pq),
      |r AS (SELECT CASE
      |        WHEN len(list_filter(string_split(path, '/'),
      |          s -> s != '')) > 4 THEN 'too_deep'
      |        WHEN (CASE WHEN qs = '' THEN 0
      |          ELSE len(string_split(qs, '&')) END) > 2
      |          THEN 'too_many_params'
      |        WHEN regexp_matches(path, '/\d{4}/\d{2}/')
      |          THEN 'calendar'
      |        ELSE 'kept' END AS reason FROM f),
      |a AS (SELECT reason, count(*) AS n_urls FROM r GROUP BY reason),
      |t AS (SELECT CAST(sum(n_urls) AS DOUBLE) AS td FROM a)
      |SELECT reason, n_urls,
      |""".stripMargin +
      s"  ${sig("CAST(n_urls AS DOUBLE) / td")} AS share\n" +
      "FROM a, t ORDER BY reason"

  /** Domain fold + the text-quality formula (the sample_quota oracle's
    * expression), sig5 applied per doc BEFORE the aggregate exactly
    * as [[graft.ops.TextStats.quality]] rounds in-plan. */
  val textQualityByDomainSql: String = {
    val f = Shared.stopOr("x", Shared.enStops)
    val quality = sig("CAST(least(nt, 100) AS DOUBLE) / 100.0 * 0.3 " +
      "+ CAST(ns AS DOUBLE) / nt * 0.4 + CAST(nd AS DOUBLE) / nt * 0.3")
    s"""WITH $urlCte, $hostCte,
       |e AS (SELECT doc_id, domain, coalesce(len(t), 0) AS nt,
       |        len(list_distinct(t)) AS nd,
       |        len(list_filter(t, x -> $f)) AS ns
       |      FROM (SELECT doc_id, domain, string_split(text, ' ') AS t
       |            FROM d)),
       |q AS (SELECT doc_id, domain, $quality AS quality FROM e),
       |a AS (SELECT domain, count(*) AS n_docs, avg(quality) AS aq,
       |        CAST(sum(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END)
       |          AS DOUBLE) / count(*) AS lows
       |      FROM q GROUP BY domain)
       |SELECT domain, n_docs, ${sig("aq")} AS avg_quality,
       |  ${sig("lows")} AS low_quality_share
       |FROM a ORDER BY domain""".stripMargin
  }

  /** Laplace-smoothed PSI/TVD over the re-derived domain buckets —
    * the categoricalDrift formula on the urlCte/hostCte fold. */
  val driftDomainsSql: String =
    s"""WITH $urlCte, $hostCte,
       |c AS (SELECT domain AS b,
       |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
       |    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
       |  FROM d GROUP BY 1),
       |t2 AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
       |    CAST(sum(cb) AS DOUBLE) AS nb,
       |    CAST(count(*) AS DOUBLE) AS k FROM c),
       |s2 AS (SELECT (ca + 0.5) / (na + 0.5 * k) AS p,
       |    (cb + 0.5) / (nb + 0.5 * k) AS q, na, nb, k FROM c, t2)
       |SELECT 'domain_mix' AS dim, CAST(min(na) AS BIGINT) AS n_a,
       |  CAST(min(nb) AS BIGINT) AS n_b,
       |  CAST(min(k) AS BIGINT) AS n_buckets,
       |  ${sig("sum((p - q) * ln(p / q))")} AS psi,
       |  ${sig("sum(abs(p - q)) / 2.0")} AS tvd
       |FROM s2""".stripMargin

  /** Five-section datasheet replay over the SAME synthesized corpus
    * (PII-augmented text + doc_id-derived URLs): each section's
    * formula is the already-audited family oracle, melted to
    * (section, entity, metric, value). */
  val corpusDatasheetSql: String = {
    import graft.ops.Pii.{EmailRe, Ipv4Re, PhoneRe}
    val qual = sig("CAST(least(nt, 100) AS DOUBLE) / 100.0 * 0.3 " +
      "+ CAST(ns AS DOUBLE) / nt * 0.4 + CAST(nd AS DOUBLE) / nt * 0.3")
    val f = Shared.stopOr("x", Shared.enStops)
    def arm(section: String, entity: String, metric: String,
        value: String, from: String): String =
      s"SELECT '$section' AS section, $entity AS entity, " +
        s"'$metric' AS metric, $value AS value FROM $from"
    val arms = Seq(
      arm("corpus", "source", "n_docs", "CAST(n_docs AS DOUBLE)", "man"),
      arm("corpus", "source", "n_tokens", "CAST(n_tokens AS DOUBLE)",
        "man"),
      arm("corpus", "source", "n_chars", "CAST(n_chars AS DOUBLE)",
        "man"),
      arm("corpus", "source", "doc_share",
        sig("CAST(n_docs AS DOUBLE) / td"), "man, mant"),
      arm("domains", "domain", "n_docs", "CAST(n_docs AS DOUBLE)",
        "domr"),
      arm("domains", "domain", "n_tokens", "CAST(n_tokens AS DOUBLE)",
        "domr"),
      arm("domains", "domain", "n_hosts", "CAST(n_hosts AS DOUBLE)",
        "domr"),
      arm("domains", "domain", "doc_share", "doc_share", "domr"),
      arm("domains", "domain", "is_hot",
        s"CAST(CASE WHEN doc_share > $HotShare THEN 1 ELSE 0 END " +
          "AS DOUBLE)", "domr"),
      arm("quality", "lang", "avg_quality", "avg_quality", "ql"),
      arm("quality", "lang", "low_quality_share", "low_quality_share",
        "ql"),
      arm("dedup", "'__corpus__'", "n_rows", "CAST(n_rows AS DOUBLE)",
        "dd"),
      arm("dedup", "'__corpus__'", "n_distinct",
        "CAST(n_distinct AS DOUBLE)", "dd"),
      arm("dedup", "'__corpus__'", "n_dup_rows",
        "CAST(n_dup_rows AS DOUBLE)", "dd"),
      arm("dedup", "'__corpus__'", "n_dup_groups",
        "CAST(n_dup_groups AS DOUBLE)", "dd"),
      arm("pii", "'__corpus__'", "n_docs", "CAST(n_docs AS DOUBLE)",
        "pt"),
      arm("pii", "'__corpus__'", "n_docs_with_pii",
        "CAST(n_docs_with_pii AS DOUBLE)", "pt"),
      arm("pii", "'__corpus__'", "n_emails",
        "CAST(n_emails AS DOUBLE)", "pt"),
      arm("pii", "'__corpus__'", "n_ips", "CAST(n_ips AS DOUBLE)",
        "pt"),
      arm("pii", "'__corpus__'", "n_phones",
        "CAST(n_phones AS DOUBLE)", "pt"),
      arm("gate", "rule", "n_docs", "CAST(n_docs AS DOUBLE)", "gj2"),
      arm("gate", "rule", "share", "share", "gj2"),
      arm("gate", "rule", "n_surviving",
        "CAST(n_surviving AS DOUBLE)", "gj2"),
      arm("model", "'__model__'", "tp", "CAST(tp AS DOUBLE)", "lrcm"),
      arm("model", "'__model__'", "fp", "CAST(fp AS DOUBLE)", "lrcm"),
      arm("model", "'__model__'", "tn", "CAST(tn AS DOUBLE)", "lrcm"),
      arm("model", "'__model__'", "fn", "CAST(fn AS DOUBLE)", "lrcm"),
      arm("model", "'__model__'", "precision",
        "CASE WHEN tp + fp > 0 THEN " +
          sig("CAST(tp AS DOUBLE) / (tp + fp)") +
          " ELSE CAST(NULL AS DOUBLE) END", "lrcm"),
      arm("model", "'__model__'", "recall",
        "CASE WHEN tp + fn > 0 THEN " +
          sig("CAST(tp AS DOUBLE) / (tp + fn)") +
          " ELSE CAST(NULL AS DOUBLE) END", "lrcm"),
      arm("model", "'__model__'", "f1",
        "CASE WHEN 2 * tp + fp + fn > 0 THEN " +
          sig("CAST(2.0 AS DOUBLE) * tp / (2 * tp + fp + fn)") +
          " ELSE CAST(NULL AS DOUBLE) END", "lrcm"),
      arm("model", "'__model__'", "auc", "auc", "lrauc"),
      arm("blocklist", "term", "occurrences",
        "CAST(occurrences AS DOUBLE)", "bls"),
      arm("blocklist", "term", "docs_hit", "CAST(docs_hit AS DOUBLE)",
        "bls"),
      arm("blocklist", "term", "doc_hit_rate",
        sig("CAST(docs_hit AS DOUBLE) / bl_nd"), "bls"))
    s"""WITH base AS (SELECT doc_id, source, lang, text ||
       |    CASE WHEN doc_id % 3 >= 1 THEN ' mail user' ||
       |      CAST(doc_id AS VARCHAR) || 'a@mail.example.com'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 3 = 2 THEN ' cc user' ||
       |      CAST(doc_id AS VARCHAR) || 'b@mail.example.com'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 2 = 0 THEN ' from 10.' ||
       |      CAST(doc_id % 200 AS VARCHAR) || '.0.' ||
       |      CAST(doc_id % 250 + 1 AS VARCHAR)
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' ||
       |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      ELSE '' END AS t2
       |  FROM documents),
       |man AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(t2, ' '))) AS BIGINT)
       |      AS n_tokens,
       |    CAST(sum(len(t2)) AS BIGINT) AS n_chars
       |  FROM base GROUP BY source),
       |mant AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS td FROM man),
       |uu AS (SELECT doc_id, t2,
       |    'https://' ||
       |    CASE WHEN doc_id % 3 = 0 THEN 'www.'
       |         WHEN doc_id % 3 = 1 THEN 'cdn' || (doc_id % 5) || '.'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 10 < 4 THEN 'hub' || (doc_id % 2)
       |         ELSE 'site' || (doc_id % 97) END || '.' ||
       |    CASE WHEN doc_id % 7 <= 2 THEN 'com'
       |         WHEN doc_id % 7 <= 4 THEN 'org'
       |         WHEN doc_id % 7 = 5 THEN 'net' ELSE 'io' END
       |      AS url FROM base),
       |hh AS (SELECT doc_id, t2,
       |    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host
       |  FROM uu),
       |ddm AS (SELECT doc_id, t2, host,
       |    hl[len(hl)-1] || '.' || hl[len(hl)] AS domain FROM (
       |    SELECT doc_id, t2, host, string_split(host, '.') AS hl
       |    FROM hh)),
       |doma AS (SELECT domain, count(*) AS n_docs,
       |    CAST(sum(len(string_split(t2, ' '))) AS BIGINT)
       |      AS n_tokens,
       |    count(DISTINCT host) AS n_hosts
       |  FROM ddm GROUP BY domain),
       |doms AS (SELECT domain, n_docs, n_tokens, n_hosts,
       |    CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS sh
       |  FROM doma),
       |domr AS (SELECT domain, n_docs, n_tokens, n_hosts,
       |    ${sig("sh")} AS doc_share FROM doms),
       |qe AS (SELECT lang, len(tk) AS nt,
       |    len(list_distinct(tk)) AS nd,
       |    len(list_filter(tk, x -> $f)) AS ns
       |  FROM (SELECT lang, string_split(t2, ' ') AS tk FROM base)),
       |qq AS (SELECT lang, $qual AS quality FROM qe),
       |ql AS (SELECT lang,
       |    ${sig("avg(quality)")} AS avg_quality,
       |    ${sig("CAST(sum(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")}
       |      AS low_quality_share
       |  FROM qq GROUP BY lang),
       |dg AS (SELECT t2, count(*) AS c FROM base GROUP BY t2),
       |dd AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       |    count(*) AS n_distinct,
       |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)
       |      AS BIGINT) AS n_dup_rows,
       |    CAST(coalesce(sum(CASE WHEN c > 1 THEN 1 END), 0)
       |      AS BIGINT) AS n_dup_groups
       |  FROM dg),
       |pd AS (SELECT
       |    CAST(len(regexp_extract_all(t2, '$EmailRe')) AS BIGINT)
       |      AS ne,
       |    CAST(len(regexp_extract_all(t2, '$Ipv4Re')) AS BIGINT)
       |      AS ni,
       |    CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT)
       |      AS np
       |  FROM base),
       |pt AS (SELECT count(*) AS n_docs,
       |    CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_docs_with_pii,
       |    CAST(sum(ne) AS BIGINT) AS n_emails,
       |    CAST(sum(ni) AS BIGINT) AS n_ips,
       |    CAST(sum(np) AS BIGINT) AS n_phones
       |  FROM pd),
       |gd AS (SELECT doc_id, string_split(t2, ' ') AS gt FROM base),
       |ge AS (SELECT doc_id, coalesce(len(gt), 0) AS nt,
       |    list_sum(list_transform(gt, x -> length(x))) AS sl,
       |    len(list_filter(gt, x -> $f)) AS ns FROM gd),
       |gts AS (SELECT doc_id, max(c) AS top_c FROM (
       |    SELECT doc_id, gw, count(*) AS c FROM (
       |      SELECT doc_id, unnest(gt) AS gw FROM gd)
       |    GROUP BY doc_id, gw) GROUP BY doc_id),
       |gfi AS (SELECT ge.doc_id,
       |  ${TextQueries.ruleCaseSql} AS rule_idx
       |  FROM ge JOIN gts USING (doc_id)),
       |gc AS (SELECT rule_idx, count(*) AS n FROM gfi
       |       GROUP BY rule_idx),
       |grl(rule_idx, rule) AS (VALUES
       |  (0, 'too_few_tokens'), (1, 'too_many_tokens'),
       |  (2, 'mean_word_length'), (3, 'too_few_stopwords'),
       |  (4, 'repetitive'), (5, 'kept')),
       |gj AS (SELECT grl.rule_idx, grl.rule, coalesce(n, 0) AS n_docs
       |       FROM grl LEFT JOIN gc USING (rule_idx)),
       |gj2 AS (SELECT rule, CAST(n_docs AS BIGINT) AS n_docs,
       |  ${sig("CAST(n_docs AS DOUBLE) / (SELECT sum(n_docs) FROM gj)")}
       |    AS share,
       |  CAST(CASE WHEN rule = 'kept' THEN n_docs
       |    ELSE (SELECT sum(n_docs) FROM gj) - sum(n_docs)
       |      OVER (ORDER BY rule_idx ROWS UNBOUNDED PRECEDING)
       |    END AS BIGINT) AS n_surviving FROM gj),
       |${ClassifierQueries.scoredCteOn(
            "(SELECT doc_id, t2 AS text FROM base)", "lr_")},
       |lrcm AS MATERIALIZED (SELECT
       |  sum(CASE WHEN yy = 1 AND prob >= 0.5 THEN 1 ELSE 0 END)
       |    AS tp,
       |  sum(CASE WHEN yy = 0 AND prob >= 0.5 THEN 1 ELSE 0 END)
       |    AS fp,
       |  sum(CASE WHEN yy = 0 AND prob < 0.5 THEN 1 ELSE 0 END)
       |    AS tn,
       |  sum(CASE WHEN yy = 1 AND prob < 0.5 THEN 1 ELSE 0 END)
       |    AS fn FROM lr_p),
       |lrgrp AS (SELECT prob, count(*) AS c, sum(yy) AS pos
       |          FROM lr_p GROUP BY prob),
       |lrcum AS (SELECT prob, c, pos, coalesce(sum(c) OVER (
       |  ORDER BY prob ROWS BETWEEN UNBOUNDED PRECEDING
       |  AND 1 PRECEDING), 0) AS lt FROM lrgrp),
       |lrag AS (SELECT
       |  sum(CAST(pos AS DOUBLE) *
       |    (lt + (c + 1) / CAST(2.0 AS DOUBLE))) AS s,
       |  sum(pos) AS np, sum(c) AS n FROM lrcum),
       |lrauc AS MATERIALIZED (SELECT
       |  CASE WHEN np = 0 OR np = n THEN CAST(NULL AS DOUBLE)
       |  ELSE ${sig("(s - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE)" +
            " + 1) / CAST(2.0 AS DOUBLE)) / (CAST(np AS DOUBLE) *" +
            " CAST(n - np AS DOUBLE))")}
       |  END AS auc FROM lrag),
       |blt(term) AS (VALUES ${BlocklistQueries.Terms
            .map(tm => s"('$tm')").mkString(", ")}),
       |blh AS (SELECT b.doc_id, term,
       |  CAST((length(lower(t2)) - length(replace(lower(t2), term,
       |    ''))) // length(term) AS BIGINT) AS n
       |  FROM base b CROSS JOIN blt),
       |bls AS (SELECT term, CAST(sum(n) AS BIGINT) AS occurrences,
       |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS docs_hit,
       |  (SELECT count(*) FROM base) AS bl_nd
       |  FROM blh GROUP BY term)
       |${arms.mkString("\nUNION ALL\n")}
       |ORDER BY section, entity, metric""".stripMargin
  }

  /** PageRank chain (Extensions.pageRankCtes) composed with the URL
    * fold: per-domain page count + sig5 rank mass, top-15. */
  val graphDomainRankSql: String =
    s"""WITH ${Extensions.pageRankCtes},
       |$urlCte, $hostCte,
       |prr AS (SELECT node, ${sig("pr")} AS pr FROM r3),
       |dm AS (SELECT d.domain, prr.pr FROM prr
       |       JOIN d ON d.doc_id = prr.node),
       |ag AS (SELECT domain, count(*) AS n_pages,
       |       ${sig("sum(pr)")} AS rank_mass FROM dm GROUP BY domain)
       |SELECT domain, n_pages, rank_mass FROM (
       |  SELECT domain, CAST(n_pages AS BIGINT) AS n_pages,
       |    rank_mass, row_number() OVER (
       |      ORDER BY rank_mass DESC, domain ASC) AS rn FROM ag)
       |WHERE rn <= 15 ORDER BY rank_mass DESC, domain ASC""".stripMargin

  val oracle: Map[String, String] = Map(
    "graph_domain_rank" -> graphDomainRankSql,
    "corpus_datasheet" -> corpusDatasheetSql,
    "drift_domains" -> driftDomainsSql,
    "text_quality_by_domain" -> textQualityByDomainSql,
    "text_domains" -> textDomainsSql,
    "sample_domain_cap" -> sampleDomainCapSql,
    "sample_domain_cap_hash" -> sampleDomainCapHashSql,
    "url_filter_stats" -> urlFilterStatsSql
  )
}
