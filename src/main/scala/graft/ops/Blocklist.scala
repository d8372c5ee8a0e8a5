package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.AhoCorasickCount.ac_counts

/** Multi-pattern blocklist matching — the C4/CCNet-style "bad word /
  * banned phrase" gate (the reference pipeline stage is a per-document
  * scan against a curated term list; C4 uses the public
  * "List-of-Dirty-Naughty-..." list, CCNet a per-language variant).
  *
  * Scale design: the naive Spark expression of this stage is k
  * `instr`/`rlike` predicates — k FULL passes over every document's
  * bytes (100 TB × k). Here the whole term list is compiled ONCE into
  * an Aho–Corasick automaton ([[graft.functions.AhoCorasickCount]], a
  * native Catalyst expression) and every document is scanned in ONE
  * O(len + matches) pass that stays inside whole-stage codegen,
  * returning the per-term occurrence counts as one array. The
  * automaton is part of the expression (serialized with the plan task
  * binary, built lazily per executor) — no join, no shuffle, map-only.
  *
  * Match semantics: byte-level, case handled by the caller (pass
  * `lower(col)`), counts EVERY occurrence position (overlapping
  * included — standard AC end-position counting; for terms with no
  * proper border, which real blocklist words are, this equals the
  * non-overlapping count).
  */
object Blocklist {

  /** Escape a term for embedding in a Spark SQL single-quoted literal
    * (the `stack` reshape below): backslashes FIRST (Spark string
    * literals treat `\` as an escape even outside ANSI mode), then
    * quotes — an unescaped backslash would silently shift every
    * subsequent term's column alignment. */
  private def sqlLit(t: String): String =
    t.replace("\\", "\\\\").replace("'", "\\'")

  /** Per-document per-term hit counts, exploded to scalar rows:
    * (id, term, n) for every document × term. One AC pass per doc. */
  def matchCounts(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val withCnts = df.select(col(idCol),
      ac_counts(lower(col(textCol)), terms).as("cnts"))
    val termArr = typedLit(terms.toList)
    withCnts.select(col(idCol),
      posexplode(col("cnts")).as(Seq("i", "n")))
      .select(col(idCol), element_at(termArr, col("i") + 1).as("term"),
        col("n"))
  }

  /** Per-document gate frame: total hits across the list, number of
    * distinct terms hit, and the keep verdict (`total <= maxTotal`).
    * The two derived columns fold the SAME counts array — the AC scan
    * runs once per document (the array projection is non-cheap, so
    * CollapseProject keeps it materialized in its own codegen stage
    * rather than duplicating it into the consumers). */
  def gate(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], maxTotal: Long = 0L): DataFrame =
    df.select(col(idCol),
      ac_counts(lower(col(textCol)), terms).as("cnts"))
      .select(col(idCol),
        aggregate(col("cnts"), lit(0L), _ + _).as("total_hits"),
        size(filter(col("cnts"), _ > 0L)).cast("long").as("terms_hit"))
      .withColumn("kept", col("total_hits") <= maxTotal)

  /** Documents that pass the gate (default: zero blocklist hits) —
    * the production filter composition. Map-only, one pass; the
    * zero-tolerance case uses the early-exit boolean scan
    * ([[graft.functions.AhoCorasickHit]]) — a rejected document stops
    * at its FIRST hit instead of counting the rest. */
  def filterDocs(df: DataFrame, textCol: String, terms: Seq[String],
      maxTotal: Long = 0L): DataFrame =
    if (maxTotal == 0L)
      df.where(!graft.functions.AhoCorasickCount
        .ac_hit(lower(col(textCol)), terms))
    else
      df.where(aggregate(ac_counts(lower(col(textCol)), terms),
        lit(0L), _ + _) <= maxTotal)

  /** Corpus-level per-term statistics: total occurrences, documents
    * hit, and the document hit rate — ONE aggregation pass computing
    * 2k element-wise sums over the counts array (no explode, no
    * shuffle beyond the single O(k)-row final exchange), reshaped to
    * k rows with `stack`. */
  def termStats(df: DataFrame, textCol: String, terms: Seq[String])
      : DataFrame = {
    val cnts = df.select(
      ac_counts(lower(col(textCol)), terms).as("cnts"),
      lit(1L).as("one"))
    val aggs = terms.indices.flatMap { i =>
      Seq(sum(element_at(col("cnts"), i + 1)).as(s"tot_$i"),
        sum(when(element_at(col("cnts"), i + 1) > 0, 1L)
          .otherwise(0L)).as(s"hit_$i"))
    } :+ sum(col("one")).as("n_docs")
    val one = cnts.agg(aggs.head, aggs.tail: _*)
    val stackArgs = terms.zipWithIndex.map { case (t, i) =>
      s"'${sqlLit(t)}', tot_$i, hit_$i"
    }.mkString(", ")
    one.selectExpr(s"stack(${terms.size}, $stackArgs) " +
      "AS (term, occurrences, docs_hit)", "n_docs")
      .select(col("term"), col("occurrences"), col("docs_hit"),
        graft.det.Sig.sig5(col("docs_hit").cast("double") /
          col("n_docs")).as("doc_hit_rate"))
  }

  /** Per-language blocklists (the CCNet shape: each language curates
    * its own term list). ONE automaton is built over the UNION of all
    * lists — every document still gets a single AC pass regardless of
    * its language — then the per-(lang, term) aggregation keeps only
    * the terms on that language's list. Cost: the union automaton is
    * marginally larger; the alternative (per-language expressions
    * dispatched by a `when` chain) codegens L separate automata and
    * breaks the single-projection shape. */
  def termStatsByLang(df: DataFrame, langCol: String, textCol: String,
      lists: Map[String, Seq[String]]): DataFrame = {
    // \u0001 is the (lang, term) membership-key separator below — a
    // term containing it could alias another language's entry
    require(lists.values.flatten.forall(!_.contains('\u0001')),
      "blocklist terms must not contain \\u0001 (membership separator)")
    val union = lists.values.flatten.toSeq.distinct.sorted
    val cnts = df.select(col(langCol).as("lang"),
      ac_counts(lower(col(textCol)), union).as("cnts"))
    val aggs = union.indices.flatMap { i =>
      Seq(sum(element_at(col("cnts"), i + 1)).as(s"tot_$i"),
        sum(when(element_at(col("cnts"), i + 1) > 0, 1L)
          .otherwise(0L)).as(s"hit_$i"))
    }
    val g = cnts.groupBy("lang").agg(aggs.head, aggs.tail: _*)
    val stackArgs = union.zipWithIndex.map { case (t, i) =>
      s"'${sqlLit(t)}', tot_$i, hit_$i"
    }.mkString(", ")
    val rows = g.selectExpr("lang",
      s"stack(${union.size}, $stackArgs) AS (term, occurrences, docs_hit)")
    val member = lists.toSeq.flatMap { case (l, ts) =>
      ts.map(tm => l + "\u0001" + tm)
    }
    rows.where(concat_ws("\u0001", col("lang"), col("term"))
      .isin(member: _*))
  }
}
