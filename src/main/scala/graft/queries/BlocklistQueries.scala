package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.det.Sig
import graft.ops.Blocklist
import Shared.t

/** Blocklist (bad-word / banned-phrase) gate queries — the C4/CCNet
  * term-list filtering stage, computed by ONE Aho–Corasick pass per
  * document ([[graft.ops.Blocklist]], native Catalyst expression)
  * instead of k per-term scans.
  *
  * Oracle strategy: every fixture term is BORDERLESS (no proper
  * prefix that is also a suffix), so the AC all-occurrences count
  * equals the non-overlapping count, which DuckDB computes exactly as
  * `(length(t) - length(replace(t, term, ''))) // length(term)` — a
  * closed form with no position enumeration. The overlap semantics
  * themselves are pinned by BlocklistSpec's ScalaCheck sweep against
  * a naive scan. Terms include two-word phrases (cross-word matches)
  * and a zero-hit term (absent-from-corpus arm). */
object BlocklistQueries {

  private def sig(x: String) = Sig.sql(x)

  /** Shared fixture blocklist — sorted, borderless, lowercase. */
  val Terms: Seq[String] = Seq("big data", "drop table", "fast merge",
    "query", "slow", "spark", "stream", "vector")

  private val termValues =
    Terms.map(tm => s"('$tm')").mkString(", ")

  /** Does `t` have a proper border (a prefix that is also a suffix)?
    * Bordered terms can self-overlap in text, where AC end-position
    * counting diverges from DuckDB's non-overlapping replace-count —
    * the oracle routes them through a positional scanner instead. */
  private def hasBorder(t: String): Boolean =
    (1 until t.length).exists(k =>
      t.substring(0, k) == t.substring(t.length - k))

  /** The fixture corpus vocabulary (31 words — TESTDATA.md's document
    * generator), the alphabet every term below is built from so the
    * large list actually matches the corpus. */
  private val Vocab: Seq[String] = Seq("a", "agg", "batch", "big",
    "column", "customer", "data", "dup", "fast", "filter", "group",
    "hash", "join", "key", "line", "merge", "order", "part", "query",
    "row", "scan", "slow", "small", "sort", "spark", "stream", "table",
    "the", "value", "vector", "window")

  /** ~400-term LDNOOBW-scale blocklist: every vocab word, a
    * deterministic spread of two-word phrases, sub-word letter
    * n-grams (mixed lengths 2–6), and a curated BORDERED subset
    * ("a a" genuinely self-overlaps wherever the corpus repeats the
    * word "a"). One automaton, one scan — the realistic-scale
    * exercise of [[graft.functions.AhoCorasickCount]]. */
  val TermsLarge: Seq[String] = {
    val phrases = (for {
      i <- Vocab.indices; j <- Vocab.indices
      if i != j && (i * 31 + j) % 3 == 0
    } yield s"${Vocab(i)} ${Vocab(j)}").filterNot(hasBorder).take(330)
    val ngrams = Seq("ar", "ta", "ue", "or", "ow", "in", "at", "er",
      "ba", "da", "que", "tab", "sca", "val", "ort", "ream", "ndow",
      "lumn", "ustom", "ilter", "roup", "ectod").filterNot(hasBorder)
    val bordered = Seq("a a", "the the", "data data", "row row",
      "dup dup", "ata", "a batch a", "erge", "w row w")
    (Vocab ++ phrases ++ ngrams ++ bordered).distinct.sorted
  }

  /** Per-language lists (CCNet shape) — a subset of [[Terms]] split
    * across the five fixture languages, so one union automaton serves
    * all five. */
  val TermsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("slow", "spark"),
    "es" -> Seq("query", "stream"),
    "zh" -> Seq("vector", "big data"),
    "fr" -> Seq("fast merge"),
    "de" -> Seq("drop table"))

  /** The (doc, term) hit-count CTE both oracles share. */
  private val hitCte =
    s"""terms(term) AS (VALUES $termValues),
       |d AS (SELECT doc_id, lower(text) AS t FROM documents),
       |h AS (SELECT d.doc_id, term,
       |  CAST((length(t) - length(replace(t, term, '')))
       |    // length(term) AS BIGINT) AS n
       |  FROM d CROSS JOIN terms)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // corpus-level per-term stats: one aggregation pass over the
    // counts array (2k element-wise sums, no explode, no shuffle)
    "text_blocklist_stats" -> ((s, dir) =>
      Blocklist.termStats(t(s, dir, "documents"), "text", Terms)
        .orderBy("term")),
    // per-document gate: total hits, terms hit, keep verdict —
    // map-only, one AC scan per document
    "text_blocklist" -> ((s, dir) =>
      Blocklist.gate(t(s, dir, "documents"), "doc_id", "text", Terms)
        .orderBy("doc_id")),
    // per-language lists, one union automaton, grouped aggregation
    "text_blocklist_by_lang" -> ((s, dir) =>
      Blocklist.termStatsByLang(t(s, dir, "documents"), "lang",
        "text", TermsByLang).orderBy("lang", "term")),
    // the realistic-scale list (~400 mixed-length terms incl. a
    // BORDERED subset): one automaton, one corpus scan; the oracle
    // replace-counts the borderless majority and POSITION-SCANS the
    // bordered terms, so AC's overlapping-occurrence semantics are
    // value-checked where they actually differ from replace-counting
    "text_blocklist_bordered" -> ((s, dir) =>
      Blocklist.termStats(t(s, dir, "documents"), "text", TermsLarge)
        .orderBy("term")))

  val oracle: Map[String, String] = Map(
    "text_blocklist_stats" ->
      s"""WITH $hitCte
         |SELECT term, CAST(sum(n) AS BIGINT) AS occurrences,
         |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_hit,
         |  ${sig("CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS DOUBLE) / (SELECT count(*) FROM documents)")}
         |    AS doc_hit_rate
         |FROM h GROUP BY term ORDER BY term""".stripMargin,
    // a null text yields NULL counts on the Spark side (ac_counts is
    // null-in-null-out, so total_hits, terms_hit, and kept are all
    // NULL); n IS NULL exactly for null-text docs here, so the CASE
    // keeps the engines aligned should the fixture ever gain one
    "text_blocklist" ->
      s"""WITH $hitCte
         |SELECT doc_id, CAST(sum(n) AS BIGINT) AS total_hits,
         |  CAST(CASE WHEN sum(n) IS NULL THEN NULL
         |    ELSE sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) END AS BIGINT)
         |    AS terms_hit,
         |  sum(n) <= 0 AS kept
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // h2's position scan emits no row for a bordered term longer
    // than every document (the unnest range is empty), while Spark's
    // termStats always emits the term with 0 occurrences — the
    // zero-anchor UNION keeps such terms in the oracle output
    // (n = 0 adds nothing to any aggregate)
    "text_blocklist_bordered" -> {
      val borderless = TermsLarge.filterNot(hasBorder)
      val bordered = TermsLarge.filter(hasBorder)
      def vals(ts: Seq[String]) = ts.map(tm => s"('$tm')").mkString(", ")
      s"""WITH bl(term) AS (VALUES ${vals(borderless)}),
         |d AS (SELECT doc_id, lower(text) AS t FROM documents),
         |h1 AS (SELECT d.doc_id, term,
         |  CAST((length(t) - length(replace(t, term, '')))
         |    // length(term) AS BIGINT) AS n
         |  FROM d CROSS JOIN bl),
         |bt(term) AS (VALUES ${vals(bordered)}),
         |h2 AS (SELECT doc_id, term,
         |  CAST(sum(CASE WHEN substr(t, CAST(i AS INTEGER),
         |      length(term)) = term THEN 1 ELSE 0 END) AS BIGINT) AS n
         |  FROM (SELECT d.doc_id, term, t,
         |      unnest(range(1, CAST(coalesce(length(t) - length(term)
         |        + 2, 1) AS BIGINT))) AS i
         |    FROM d CROSS JOIN bt)
         |  GROUP BY doc_id, term),
         |h AS (SELECT * FROM h1 UNION ALL SELECT * FROM h2
         |  UNION ALL SELECT CAST(NULL AS BIGINT) AS doc_id, term,
         |    CAST(0 AS BIGINT) AS n FROM bt)
         |SELECT term, CAST(sum(n) AS BIGINT) AS occurrences,
         |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_hit,
         |  ${sig("CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS DOUBLE) / (SELECT count(*) FROM documents)")}
         |    AS doc_hit_rate
         |FROM h GROUP BY term ORDER BY term""".stripMargin
    },
    "text_blocklist_by_lang" -> {
      val pairValues = TermsByLang.toSeq.sortBy(_._1).flatMap {
        case (l, ts) => ts.map(tm => s"('$l', '$tm')")
      }.mkString(", ")
      s"""WITH pl(lang, term) AS (VALUES $pairValues),
         |d AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
         |h AS (SELECT d.lang, term,
         |  CAST((length(t) - length(replace(t, term, '')))
         |    // length(term) AS BIGINT) AS n
         |  FROM d JOIN pl ON pl.lang = d.lang)
         |SELECT lang, term, CAST(sum(n) AS BIGINT) AS occurrences,
         |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_hit
         |FROM h GROUP BY lang, term ORDER BY lang, term""".stripMargin
    })
}
