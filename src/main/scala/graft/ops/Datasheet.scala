package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig

/** The one-call corpus DATASHEET (Gebru et al., "Datasheets for
  * Datasets"): source composition, registrable-domain mix,
  * per-language quality, exact duplication and PII exposure as ONE
  * long-format frame `(section, entity, metric, value)` — the
  * release artifact a training-data pipeline publishes next to the
  * corpus. Every section is an existing audited operator re-shaped,
  * so the datasheet inherits their scale properties: each section is
  * one hash aggregation (plus the PII regex projection), the melted
  * output is O(sources + domains + langs) rows, and nothing driver-
  * side grows with the corpus. */
object Datasheet {

  /** Long-format melt: one (section, entity, metric, value) row per
    * metric column. Values cast to double (counts < 2^53 stay
    * exact; float metrics arrive already sig5-rounded from their
    * source operators). */
  private def melt(df: DataFrame, section: String, entityCol: Column,
      metrics: Seq[String]): DataFrame =
    df.select(lit(section).as("section"),
        entityCol.cast("string").as("entity"),
        explode(array(metrics.map(m =>
          struct(lit(m).as("metric"),
            col(m).cast("double").as("value"))): _*)).as("kv"))
      .select(col("section"), col("entity"),
        col("kv.metric").as("metric"), col("kv.value").as("value"))

  /** Builds the datasheet over the corpus AS GIVEN (the caller
    * decides which columns exist; `urlCol = None` drops the domain
    * section). Sections:
    *  - corpus:   per-source docs/tokens/chars/doc share
    *  - domains:  per-registrable-domain docs/tokens/hosts/share/hot
    *  - quality:  per-language mean quality + low-quality share
    *  - dedup:    exact text duplication counts (one entity)
    *  - pii:      regex-detected exposure totals (one entity)
    *  - blocklist (opt-in): per-term occurrences / docs hit / hit
    *    rate from ONE Aho–Corasick pass ([[Blocklist.termStats]])
    */
  def corpusDatasheet(docs: DataFrame, srcCol: String = "source",
      langCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text", urlCol: Option[String] = None,
      hotShare: Double = 0.05,
      gate: Option[QualityRules.Thresholds] = None,
      lrIters: Option[Int] = None,
      blocklist: Option[Seq[String]] = None): DataFrame = {
    val corpus = melt(TextStats.manifest(docs, srcCol, textCol),
      "corpus", col(srcCol),
      Seq("n_docs", "n_tokens", "n_chars", "doc_share"))

    val domains = urlCol.map { u =>
      melt(UrlOps.domainProfile(docs, u, textCol, hotShare)
          .withColumn("is_hot", col("is_hot").cast("int")),
        "domains", col("domain"),
        Seq("n_docs", "n_tokens", "n_hosts", "doc_share", "is_hot"))
    }

    val q = TextStats.quality(docs, idCol, textCol)
      .select(col("doc_id"), col("quality"))
    val quality = melt(
      docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
        .join(q, Seq("doc_id"))
        .groupBy("lang")
        .agg(Sig.sig5(avg(col("quality"))).as("avg_quality"),
          Sig.sig5(sum(when(col("quality") < 0.5, 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("low_quality_share")),
      "quality", col("lang"), Seq("avg_quality", "low_quality_share"))

    val dedup = melt(Dedup.exactStats(docs, Seq(textCol)),
      "dedup", lit("__corpus__"),
      Seq("n_rows", "n_distinct", "n_dup_rows", "n_dup_groups"))

    val p = Pii.piiStats(docs, idCol, textCol)
    val pii = melt(
      p.agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0,
          1L).otherwise(0L)).as("n_docs_with_pii"),
        sum("n_emails").as("n_emails"),
        sum("n_ips").as("n_ips"),
        sum("n_phones").as("n_phones")),
      "pii", lit("__corpus__"),
      Seq("n_docs", "n_docs_with_pii", "n_emails", "n_ips", "n_phones"))

    // gate:     per-rule first-fail counts, shares, survival curve
    // (the quality-gate funnel — which rule eats how much of the
    // release; optional because the thresholds are a pipeline
    // decision, not a datasheet default)
    val gateSec = gate.map { th =>
      melt(QualityRules.filterFunnel(docs, idCol, textCol,
          th.minTokens, th.maxTokens, th.minMeanWordLen,
          th.maxMeanWordLen, th.minStopwords, th.maxTopTokenFrac),
        "gate", col("rule"), Seq("n_docs", "share", "n_surviving"))
    }

    // model:    the learned-filter scorecard next to the gate it
    // distills — confusion at τ=0.5 plus the exact AUC (requires
    // `gate` for the teacher labels; `lrIters` opts in because
    // training is a pipeline decision, not a datasheet default)
    val modelSec = for { th <- gate; it <- lrIters } yield {
      val feats = Materialize.materialize(
        Classifier.featurize(docs, idCol, textCol, th))
      val sc = Classifier.scored(feats, Classifier.train(feats, it))
      melt(Classifier.confusion(sc)
          .crossJoin(broadcast(Classifier.auc(sc).select(col("auc")))),
        "model", lit("__model__"),
        Seq("tp", "fp", "tn", "fn", "precision", "recall", "f1",
          "auc"))
    }

    // blocklist: per-term exposure of a curated banned-term list —
    // opt-in because the list is a pipeline decision
    val blSec = blocklist.map { terms =>
      melt(Blocklist.termStats(docs, textCol, terms),
        "blocklist", col("term"),
        Seq("occurrences", "docs_hit", "doc_hit_rate"))
    }

    (Seq(corpus) ++ domains ++ Seq(quality, dedup, pii) ++ gateSec ++
        modelSec ++ blSec)
      .reduce(_.unionByName(_))
      .orderBy("section", "entity", "metric")
  }
}
