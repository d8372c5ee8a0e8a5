package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Keyword search scoring over a document corpus — the retrieval
  * primitive of a training-data pipeline (nearest-neighbor mining for
  * eval curation, boilerplate hunting, targeted corpus slicing).
  *
  * Scale shape: document lengths and the per-term document
  * frequencies are corpus aggregates computed with map-side partial
  * aggregation; the per-(doc, term) frequency frame is FILTERED TO
  * THE QUERY TERMS before any shuffle, so the join graph moves
  * O(matching postings), never the full token stream; the df table is
  * O(|query|) rows and broadcast. Top-k is TakeOrdered (no global
  * sort materialization).
  */
object Search {

  /** Okapi BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1−b+b·dl/avgdl)), idf = ln((N−df+0.5)/(df+0.5)+1)
    * (the Lucene non-negative variant). Ranking and the k-cut use the
    * sig5-ROUNDED score with doc-id tie-break (engine contract:
    * discrete decisions rank rounded values — ln is not required to
    * be correctly rounded by IEEE 754, so raw scores may differ by an
    * ulp across engines). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextStats.tokens(col(textCol))).as("t"))
    val lens = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // two corpus scalars (N, avgdl) as a 1-row broadcast frame — no
    // driver round-trip, stays one lazy plan
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
      avg("dl").as("avgdl"))
    val qtok = tok.where(col("t").isin(terms: _*))
    val dfT = qtok.groupBy("t")
      .agg(countDistinct(col("doc_id")).as("df_t"))
    val tf = qtok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(broadcast(dfT), Seq("t"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5)
          + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
    val ranked = scored.groupBy("doc_id")
      .agg(sig5(sum("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    // rnk assigned after the k-cut: the window runs over k rows, not
    // the corpus (single-partition window over the full scored set
    // would serialize the sort at scale)
    ranked.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select("rnk", "doc_id", "score")
      .orderBy("rnk")
  }

  /** fastText-shaped linear document classifier: score(doc) =
    * sigmoid(mean over tokens of w(token)), keep = score ≥ 0.5 — the
    * model-based quality-filter stage of a corpus pipeline (the real
    * deployment swaps in trained weights; the distributed scoring
    * plan is identical). Weights here are a deterministic surrogate
    * lookup keyed on the token's corpus count through the MINSTD
    * mixer, mapped to [−1, 1] — pure BIGINT+double arithmetic, so the
    * oracle re-derives the whole model relationally (a string hash
    * would be Spark-only).
    *
    * Scale shape: the "model" is the (token → count) aggregate — one
    * shuffle with map-side combine; scoring is one join of the token
    * stream against it plus a per-doc aggregation. The keep decision
    * ranks the sig5-ROUNDED score (engine contract for discrete
    * decisions). */
  def linearScore(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextStats.tokens(col(textCol))).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val weighted = freq.withColumn("w",
      (Sampling.minstdMille(col("c")).cast("double") - 499.5) / 499.5)
    tok.join(weighted, Seq("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sig5(lit(1.0) / (lit(1.0) + exp(-avg("w")))).as("score"))
      .withColumn("keep", (col("score") >= 0.5).cast("boolean"))
      .orderBy("doc_id")
  }

  /** Unigram language-model quality score (the CCNet-style
    * perplexity filter, reduced to its unigram core): train p(t) =
    * count(t)/total on the corpus itself, score every document by its
    * average negative log-likelihood −Σ ln p(t) / |doc| (nats; low =
    * in-distribution text, high = out-of-distribution/noise).
    *
    * Scale shape: the model IS a (token → count) aggregate — one
    * shuffle with map-side combine; scoring joins the token stream
    * against it on the token key and aggregates per doc. Corpus
    * totals ride a 1-row broadcast. Smoothing-free by construction
    * (every scored token was seen in training, since the corpus
    * scores itself; score a FOREIGN corpus through the same join and
    * unseen tokens drop out — add-one smoothing is a one-line
    * coalesce if needed). */
  def unigramNll(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextStats.tokens(col(textCol))).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = freq.agg(sum("c").as("total"))
    tok.join(freq, Seq("t"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sig5(avg(-log(col("c").cast("double") / col("total"))))
          .as("nll"))
      .orderBy("doc_id")
  }

  /** Adjacent-bigram frame (doc, w1, w2), one row per OCCURRENCE —
    * the shared derivation for bigram LM training and scoring. Two
    * projections on purpose: `w` is referenced more than once, so
    * CollapseProject keeps the split() out of the transform lambda
    * (the hashedGramFrame O(tokens²) note applies verbatim). */
  private def bigramPairs(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    bigramPairsCarry(df, idCol, textCol, Nil)

  /** Interpolated bigram Kneser–Ney document scoring (Kneser & Ney
    * 1995; Chen & Goodman 1999) — the CCNet-style LM-perplexity
    * filter: train the LM on a REFERENCE slice, score every document
    * by per-bigram negative log-likelihood, keep the in-distribution
    * tail. Unlike [[unigramNll]] (self-scored, smoothing-free), this
    * is the cross-corpus form, so unseen events are first-class:
    *
    *   P(w2|w1) = (max(c(w1w2)−D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·)
    *   Pcont(w2) = N1+(·w2) / N1+(··)      (continuation probability)
    *
    * with c(w1·) unseen → back off to Pcont(w2) alone, and a 1e-10
    * probability floor for tokens the model has never seen in any
    * role (deterministic — both engines floor identically).
    *
    * Scale shape: the MODEL is three aggregates of the training
    * bigram stream — bigram counts (O(bigram types), Zipf-bounded),
    * left-context totals and continuation counts (O(vocab)) — all
    * map-side combined; scoring joins the scored corpus's bigram
    * stream against them on token keys (the model side is the small
    * side at corpus scale — AQE broadcasts it), and the grand total
    * rides a 1-row broadcast. Nothing driver-side; no UDFs. */
  /** A trained KN bigram model: three aggregates plus the 1-row
    * bigram-type count (see [[knBigramNll]]) — all static frames a
    * streaming scorer can stream-static join against. */
  case class KnLm(big: DataFrame, left: DataFrame, cont: DataFrame,
    types: DataFrame, discount: Double)

  /** The model's DERIVED frames from its sufficient statistic (the
    * bigram-count table): left-context totals, continuation counts
    * and the type total are all O(bigram types) re-aggregations, so
    * any source of a correct count table (fresh training, a
    * merge-on-read of persisted deltas) yields the identical model. */
  def knFromCounts(big: DataFrame, discount: Double = 0.75): KnLm =
    KnLm(big,
      big.groupBy("w1").agg(sum("c").as("c1"), count(lit(1)).as("n1f")),
      big.groupBy("w2").agg(count(lit(1)).as("n1b")),
      big.agg(count(lit(1)).as("bi_types")),
      discount)

  def knTrain(train: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): KnLm =
    knFromCounts(bigramPairs(train, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c")), discount)

  /** Persisted INCREMENTAL KN — the dedup-catalog/ANN-index lifecycle
    * applied to the LM: the bigram-count table is the model's entire
    * sufficient statistic and counts merge by ADDITION, so a daily
    * batch appends its O(batch) delta counts and never rescans the
    * corpus; the derived frames (continuation counts are counts of
    * DISTINCT types, which do NOT merge additively) are recomputed
    * from the merged counts at load — an O(bigram types)
    * re-aggregation, corpus-size-free. [[compactKnCounts]] folds
    * accumulated deltas into one table via the temp-dir + rename
    * swap (the ProfileStore contract: a failure mid-write must not
    * truncate the store). */
  def writeKnCounts(train: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    bigramPairs(train, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"$path/counts")

  def appendKnCounts(batch: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    bigramPairs(batch, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .write.mode("append").parquet(s"$path/counts")

  /** Merge-on-read of the persisted delta counts → the full model. */
  def loadKn(spark: org.apache.spark.sql.SparkSession, path: String,
      discount: Double = 0.75): KnLm = {
    // Crash-recovery: if a compact died between its two renames,
    // `counts` is missing but `counts_old` holds the full pre-compact
    // delta set — read that instead (merge-on-read makes it valid).
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/counts")))
        s"$path/counts"
      else s"$path/counts_old"
    knFromCounts(spark.read.parquet(dir)
      .groupBy("w1", "w2").agg(sum("c").as("c")), discount)
  }

  def compactKnCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val tmp = s"$path/counts_compact_tmp"
    spark.read.parquet(s"$path/counts")
      .groupBy("w1", "w2").agg(sum("c").as("c"))
      .write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val cur = new org.apache.hadoop.fs.Path(s"$path/counts")
    val old = new org.apache.hadoop.fs.Path(s"$path/counts_old")
    // Hadoop rename signals failure by RETURNING FALSE — check each
    // step so a failed swap can't silently leave stale/duplicated
    // counts behind; loadKn falls back to counts_old for the window
    // between the two renames.
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(cur, old),
      s"compactKnCounts: rename $cur -> $old failed")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), cur),
      s"compactKnCounts: rename $tmp -> $cur failed")
    fs.delete(old, true)
  }

  /** Per-bigram-occurrence negative log-likelihood under `lm`:
    * (doc_id, nl) plus any `carry` columns from the bigram frame.
    * Pure joins + projection — stateless, so it is legal inside a
    * streaming plan (the batch and streaming scorers share it). */
  def knScoreBigrams(pairs: DataFrame, lm: KnLm): DataFrame = {
    val d = lit(lm.discount)
    // A training slice with no >=2-token docs gives bi_types = 0;
    // guard the ratio (ANSI mode makes x/0 a DIVIDE_BY_ZERO crash,
    // not NaN) and degrade to the probability floor instead.
    val pcont = when(col("bi_types") > 0,
      coalesce(col("n1b").cast("double"), lit(0.0)) /
        col("bi_types")).otherwise(lit(0.0))
    val p = when(col("c1").isNotNull,
        (greatest(coalesce(col("c").cast("double"), lit(0.0)) - d,
          lit(0.0)) + d * col("n1f") * pcont) / col("c1"))
      .otherwise(pcont)
    pairs
      .join(lm.big, Seq("w1", "w2"), "left")
      .join(lm.left, Seq("w1"), "left")
      .join(lm.cont, Seq("w2"), "left")
      .crossJoin(broadcast(lm.types))
      .withColumn("nl", -log(greatest(p, lit(1e-10))))
      .drop("w1", "w2", "c", "c1", "n1f", "n1b", "bi_types")
  }

  def knBigramNll(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame =
    knScoreBigrams(bigramPairs(score, idCol, textCol),
        knTrain(train, idCol, textCol, discount))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sig5(avg(col("nl"))).as("nll"),
        sig5(exp(avg(col("nl")))).as("ppl"))
      .orderBy("doc_id")

  /** BLOCKED Kneser–Ney: one model per block (language, source …)
    * trained and applied in ONE pass each — the production form of
    * [[knBigramNll]] for a multilingual corpus, where a global model
    * would score every non-majority language as noise. The block
    * rides every model KEY (counts, continuation, type totals are
    * all per-block — a word common in one language can be rare in
    * another), exactly the [[Dedup.ngramJaccardPairsBlocked]]
    * contract. A block absent from the training slice backs off to
    * the probability floor (NULL-tolerant expression, identical in
    * both engines). Same shuffle count as the global form; the keys
    * are just (block, token) pairs. */
  def knBigramNllByBlock(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, blockCol: String,
      discount: Double = 0.75): DataFrame = {
    def pairs(df: DataFrame) = bigramPairsCarry(df, idCol, textCol,
      Seq("blk" -> col(blockCol).cast("string")))
    val big = pairs(train).groupBy("blk", "w1", "w2")
      .agg(count(lit(1)).as("c"))
    val left = big.groupBy("blk", "w1")
      .agg(sum("c").as("c1"), count(lit(1)).as("n1f"))
    val cont = big.groupBy("blk", "w2").agg(count(lit(1)).as("n1b"))
    val types = big.groupBy("blk").agg(count(lit(1)).as("bi_types"))
    val d = lit(discount)
    val pcont = coalesce(col("n1b").cast("double"), lit(0.0)) /
      col("bi_types")
    val p = when(col("c1").isNotNull,
        (greatest(coalesce(col("c").cast("double"), lit(0.0)) - d,
          lit(0.0)) + d * col("n1f") * pcont) / col("c1"))
      .otherwise(pcont)
    pairs(score)
      .join(big, Seq("blk", "w1", "w2"), "left")
      .join(left, Seq("blk", "w1"), "left")
      .join(cont, Seq("blk", "w2"), "left")
      .join(types, Seq("blk"), "left")
      .select(col("doc_id"), col("blk"),
        (-log(greatest(p, lit(1e-10)))).as("nl"))
      .groupBy("doc_id", "blk")
      .agg(count(lit(1)).as("n_bigrams"),
        sig5(avg(col("nl"))).as("nll"),
        sig5(exp(avg(col("nl")))).as("ppl"))
      .withColumnRenamed("blk", "block")
      .orderBy("doc_id")
  }

  /** CCNet's head/middle/tail release buckets (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets ..."): per
    * language, documents ranked by KN nll and cut at integer
    * terciles — head = most in-distribution third, the slice CCNet
    * keeps by default. Ranking uses the sig5-ROUNDED nll with doc_id
    * tie-break (discrete decisions rank rounded values — the engine
    * contract), and the tercile cuts rn·3 ≤ n / rn·3 ≤ 2n are pure
    * integer arithmetic, so there is no interpolated quantile for
    * two engines to disagree about.
    *
    * Scale shape: this DECLARED form ranks each language partition
    * through one sort window — the exact audit form. The corpus
    * path replaces the window with per-language GK nll thresholds
    * (profiler quantile machinery) and a map-only bucket compare;
    * same output contract, no per-language sort. */
  /** Per-document tercile assignment (doc_id, lang, nll, ppl, rn,
    * n, bucket) — the shared derivation behind [[knPplBuckets]] and
    * pipeline LM cuts that keep/drop whole buckets. */
  def knPplBucketAssign(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, langCol: String,
      discount: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = knBigramNll(train, score, idCol, textCol, discount)
    val lg = perDoc.join(score.select(col(idCol).as("doc_id"),
      col(langCol).as("lang")), Seq("doc_id"))
    val w = Window.partitionBy("lang").orderBy(col("nll"), col("doc_id"))
    lg.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), lit("head"))
          .when(col("rn") * 3 <= col("n") * 2, lit("middle"))
          .otherwise(lit("tail")))
  }

  def knPplBuckets(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, langCol: String, discount: Double = 0.75)
      : DataFrame =
    knPplBucketAssign(train, score, idCol, textCol, langCol, discount)
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sig5(avg(col("ppl"))).as("avg_ppl"),
        max(col("nll")).as("max_nll"))
      .orderBy("lang", "bucket")

  /** Error contract for the ppl-bucket PRODUCTION path: the corpus
    * form replaces [[knPplBuckets]]'s per-language sort window with
    * per-language GK tercile thresholds (`percentile_approx`,
    * rank error ≤ n/accuracy) and a map-only value compare. This
    * query runs BOTH forms and emits, per (lang, bucket), the
    * deviation verdict under the provable bound
    *
    *   |n_exact − n_approx| ≤ 2·⌈n/accuracy⌉ + maxTie + 2
    *
    * (GK rank slack on each threshold, plus the largest nll tie
    * class — the value compare lands a whole tie class on one side
    * while the exact rank cut splits it, plus integer-cut rounding).
    * All-true output; the oracle is the literal contract table — a
    * bound violation flips a boolean and fails the hash. */
  def knPplBucketsApproxErr(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, langCol: String,
      accuracy: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = score.sparkSession
    import s.implicits._
    // r17: the scored frame feeds FIVE subplans below (exact buckets,
    // GK thresholds, approx buckets, the tie-class bound, the lang
    // frame) — materialize it once or the whole KN train+score join
    // chain re-executes per consumer (ReuseExchange only dedupes the
    // identical exchanges, not the per-consumer aggregations above
    // them). O(docs) rows; values unchanged.
    val lg = graft.ops.Materialize.materialize(
      knBigramNll(train, score, idCol, textCol)
        .join(score.select(col(idCol).as("doc_id"),
          col(langCol).as("lang")), Seq("doc_id")))
    val w = Window.partitionBy("lang").orderBy(col("nll"), col("doc_id"))
    val bucketOf = (cond1: Column, cond2: Column) =>
      when(cond1, lit("head")).when(cond2, lit("middle"))
        .otherwise(lit("tail"))
    val exact = lg
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .groupBy(col("lang"), bucketOf(col("rn") * 3 <= col("n"),
        col("rn") * 3 <= col("n") * 2).as("bucket"))
      .agg(count(lit(1)).as("n_exact"))
    val thr = lg.groupBy("lang")
      .agg(percentile_approx(col("nll"),
        typedLit(Seq(1.0 / 3.0, 2.0 / 3.0)), lit(accuracy)).as("t"))
    val approx = lg.join(thr, Seq("lang"))
      .groupBy(col("lang"),
        bucketOf(col("nll") <= element_at(col("t"), 1),
          col("nll") <= element_at(col("t"), 2)).as("bucket"))
      .agg(count(lit(1)).as("n_approx"))
    val bound = lg.groupBy("lang", "nll").agg(count(lit(1)).as("tc"))
      .groupBy("lang").agg(max("tc").as("max_tie"),
        sum("tc").as("n"))
      .select(col("lang"),
        (lit(2) * ceil(col("n").cast("double") / accuracy) +
          col("max_tie") + lit(2)).as("bound"))
    val frame = lg.select("lang").distinct()
      .crossJoin(Seq("head", "middle", "tail").toDF("bucket"))
    frame
      .join(exact, Seq("lang", "bucket"), "left")
      .join(approx, Seq("lang", "bucket"), "left")
      .join(bound, Seq("lang"))
      .select(col("lang"), col("bucket"),
        (abs(coalesce(col("n_exact"), lit(0L)) -
          coalesce(col("n_approx"), lit(0L))) <= col("bound"))
          .as("within_bound"))
      .orderBy("lang", "bucket")
  }

  /** Adjacent-trigram frame (doc, w1, w2, w3) per occurrence — the
    * bigramPairs derivation at order 3 (same CollapseProject
    * two-projection shape). */
  private def trigramTriples(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("w"))
      .select(col("doc_id"), explode(when(size(col("w")) >= 3,
          expr("transform(sequence(0, size(w)-3), i -> struct(" +
            "w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3))"))
        .otherwise(expr("CAST(array() AS " +
          "array<struct<w1:string,w2:string,w3:string>>)")))
        .as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"), col("b.w3"))

  /** Order-3 interpolated Kneser–Ney (the KenLM shape at trigram
    * order, single discount): the top level interpolates true
    * trigram counts with the bigram level, and the bigram level is
    * built from CONTINUATION counts (distinct left contexts), not
    * raw counts — the KN insight, applied recursively:
    *
    *   P3(w3|w1w2) = (max(c3−D,0) + D·N1+(w1w2·)·P2(w3|w2)) / c3(w1w2·)
    *   P2(w3|w2)   = (max(t2−D,0) + D·N2(w2·)·Pc(w3)) / t2(w2·)
    *   Pc(w3)      = N1+(·w3) / N1+(··)       over BIGRAM types
    *
    * where t2(w2w3) = N1+(·w2w3) is the distinct-left-context count
    * of the bigram. Unseen (w1,w2) backs off to P2, unseen w2 to
    * Pc, never-seen w3 to the 1e-10 floor — every tier a
    * NULL-tolerant CASE identical across engines.
    *
    * Scale shape: the whole model is FIVE aggregates of the trigram
    * type table (itself one map-side-combined aggregation of the
    * trigram stream): trigram counts, (w1,w2) context totals,
    * bigram continuation counts, w2 context totals, unigram
    * continuation counts — O(trigram types), Zipf-bounded; scoring
    * is the trigram stream joined against them on token keys. */
  def knTrigramNll(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    val tri = trigramTriples(train, idCol, textCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val triCtx = tri.groupBy("w1", "w2")
      .agg(sum("c3").as("c3ctx"), count(lit(1)).as("n3"))
    val t2 = tri.groupBy("w2", "w3").agg(count(lit(1)).as("t2c"))
    val t2Ctx = t2.groupBy("w2")
      .agg(sum("t2c").as("t2ctx"), count(lit(1)).as("n2"))
    val cont3 = t2.groupBy("w3").agg(count(lit(1)).as("n1b3"))
    val types = t2.agg(count(lit(1)).as("bi_types3"))
    val d = lit(discount)
    val pc = coalesce(col("n1b3").cast("double"), lit(0.0)) /
      col("bi_types3")
    val p2 = when(col("t2ctx").isNotNull,
        (greatest(coalesce(col("t2c").cast("double"), lit(0.0)) - d,
          lit(0.0)) + d * col("n2") * pc) / col("t2ctx"))
      .otherwise(pc)
    val p3 = when(col("c3ctx").isNotNull,
        (greatest(coalesce(col("c3").cast("double"), lit(0.0)) - d,
          lit(0.0)) + d * col("n3") * p2) / col("c3ctx"))
      .otherwise(p2)
    trigramTriples(score, idCol, textCol)
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(triCtx, Seq("w1", "w2"), "left")
      .join(t2, Seq("w2", "w3"), "left")
      .join(t2Ctx, Seq("w2"), "left")
      .join(cont3, Seq("w3"), "left")
      .crossJoin(broadcast(types))
      .select(col("doc_id"),
        (-log(greatest(p3, lit(1e-10)))).as("nl"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sig5(avg(col("nl"))).as("nll"),
        sig5(exp(avg(col("nl")))).as("ppl"))
      .orderBy("doc_id")
  }

  /** Bigram frame with extra per-doc columns carried through (the
    * hashedGramFrame `carry` pattern) — for blocked/streaming KN
    * variants that need a language or event-time column alongside
    * each bigram occurrence. */
  private[graft] def bigramPairsCarry(df: DataFrame, idCol: String,
      textCol: String, carry: Seq[(String, Column)]): DataFrame =
    df.select(col(idCol).as("doc_id") +:
        carry.map { case (nm, c) => c.as(nm) } :+
        split(col(textCol), " ").as("w"): _*)
      .select(col("doc_id") +: carry.map(c => col(c._1)) :+
        explode(when(size(col("w")) >= 2,
          expr("transform(sequence(0, size(w)-2)," +
            " i -> struct(w[i] AS w1, w[i+1] AS w2))"))
        .otherwise(expr(
          "CAST(array() AS array<struct<w1:string,w2:string>>)")))
        .as("b"): _*)
      .select(col("doc_id") +: carry.map(c => col(c._1)) :+
        col("b.w1") :+ col("b.w2"): _*)

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher, SIGIR 2009): fuse the lexical (BM25) and semantic
    * (embedding-cosine) rankings with score(d) = Σ 1/(rrfK + rank_d)
    * over the lists that retrieved d — the standard first-stage
    * fusion of a modern retrieval stack (rank-based, so the two
    * legs' incomparable score scales never meet).
    *
    * Scale shape: both legs end in bounded top-k cuts, so the fusion
    * join moves ≤ 2k rows regardless of corpus size; the legs
    * themselves are the already-scale-shaped [[bm25TopK]] and
    * cosine machinery (swap in the ANN family's pruned top-k for the
    * semantic leg at corpus scale — same (doc, rank) contract).
    *
    * Determinism: ranks are exact integers; 1/(rrfK + rank) is one
    * correctly-rounded IEEE division and the two-term sum has a
    * fixed order (lexical + semantic) — bit-identical cross-engine
    * with NO sig5 rounding needed. Ties break on doc id. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, docIdCol: String,
      textCol: String, vecIdCol: String, vecCol: String,
      terms: Seq[String], k: Int = 20, topM: Int = 10,
      rrfK: Int = 60): DataFrame = {
    val lex = bm25TopK(docs, docIdCol, textCol, terms, k)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    // semantic leg: exact cosine around query vector 0 (the declared
    // verification form; ANN top-k composes identically)
    val sem = Similarity.cosineTopK(emb, vecIdCol, vecCol,
        numQueries = 1, k = k)
      .select(col("neighbor_id").as("doc_id"),
        col("rnk").as("sem_rnk"))
    val kD = rrfK.toDouble
    val score =
      coalesce(lit(1.0) / (lit(kD) + col("lex_rnk").cast("double")),
        lit(0.0)) +
      coalesce(lit(1.0) / (lit(kD) + col("sem_rnk").cast("double")),
        lit(0.0))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), score.as("rrf_score"),
        col("lex_rnk"), col("sem_rnk"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(topM)
    // rank stamped AFTER the cut: the window sees topM rows only
    fused.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_score").desc, col("doc_id").asc))
        .cast("long"))
      .select("rnk", "doc_id", "rrf_score", "lex_rnk", "sem_rnk")
      .orderBy("rnk")
  }
}
