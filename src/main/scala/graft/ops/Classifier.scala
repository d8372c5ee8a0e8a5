package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.det.Sig.sig5

/** Learned document-quality filter (Joulin et al. 2016 "Bag of
  * Tricks" / Wenzek et al. 2019 CCNet §4 — the MODEL-based stage
  * every production crawl pipeline runs next to the rule gate): a
  * logistic-regression classifier over cheap per-document text
  * signals, here DISTILLED from the [[QualityRules]] Gopher gate
  * (the gate's keep decision is the training label, exactly as
  * CCNet distills "looks like Wikipedia" into fastText), trained by
  * full-batch gradient descent INSIDE the engine.
  *
  * Why train distributively at all: at 100 TB the labeled frame IS
  * the corpus — the featurizer is one map-only projection (six
  * doubles per doc; the repetition signal is [[QualityRules]]'
  * in-row sorted-run fold, no (doc, token) shuffle), and each GD
  * iteration is ONE map-side-combined aggregation producing six
  * numbers. Driver state is O(features · iters) — the codebook/LUT
  * contract. Iterations are a FIXED small count (a linear separator
  * over 5 standardized signals converges in a handful of full-batch
  * steps), so the whole training run is `iters + 2` scans of a
  * cached O(n·6) frame, each a scan-agg with no corpus-sized
  * shuffle anywhere.
  *
  * Determinism contract: feature standardization moments and every
  * iteration's weight vector are sig5-rounded (the shared-literal
  * trick from the trend fit) — each iteration's inputs are bitwise
  * identical on both engines, so cross-engine float-sum noise
  * cannot compound across iterations. */
object Classifier {

  /** Weight names, index-aligned with the weight vector (0 = bias). */
  val FeatureNames: Seq[String] = Seq("bias", "ln_tokens",
    "mean_word_len", "stop_ratio", "distinct_ratio", "top_frac")

  private val K = 5 // non-bias features x1..x5

  /** Trained model: sig5-rounded standardization moments and the
    * per-iteration weight trajectory (last row = final weights). */
  case class LrModel(mu: Array[Double], sigma: Array[Double],
      trajectory: Array[Array[Double]]) {
    def weights: Array[Double] = trajectory.last
  }

  /** Labeled feature frame: (doc_id, y, x1..x5) for every doc with
    * at least one token. y is the [[QualityRules]] gate's keep
    * decision at `th` (the distillation teacher); features are
    * ln(token count), mean word length, stopword ratio, distinct
    * ratio, top-token fraction — all exact integer ratios (or ln of
    * one) from ONE projection sharing the gate's own token folds. */
  def featurize(df: DataFrame, idCol: String, textCol: String,
      th: QualityRules.Thresholds,
      carry: Seq[String] = Nil): DataFrame = {
    val en = TextStats.stopwords.toMap.apply("en")
    // `carry` threads extra df columns (event time, source) through
    // the projection — the ruleAssign contract that keeps streaming
    // twins map-only instead of joining back against their input
    val base = df
      .select(col(idCol).as("doc_id") +: carry.map(col) :+
        split(col(textCol), " ").as("w"): _*)
      .select((col("doc_id") +: carry.map(col)) ++ Seq(
        coalesce(size(col("w")).cast("long"), lit(0L)).as("nt"),
        aggregate(col("w"), lit(0L), (acc, x) => acc + length(x))
          .as("sl"),
        size(filter(col("w"), t =>
          t.isin(en.map(x => lit(x)): _*))).cast("long").as("ns"),
        size(array_distinct(col("w"))).cast("long").as("nd"),
        QualityRules.topRunExpr.as("top_c")): _*)
      .where(col("nt") >= 1L)
    val meanWl = col("sl").cast("double") / col("nt")
    val topFrac = col("top_c").cast("double") / col("nt")
    val y = when(col("nt") < th.minTokens, 0.0)
      .when(col("nt") > th.maxTokens, 0.0)
      .when(meanWl < th.minMeanWordLen ||
        meanWl > th.maxMeanWordLen, 0.0)
      .when(col("ns") < th.minStopwords, 0.0)
      .when(topFrac > th.maxTopTokenFrac, 0.0)
      .otherwise(1.0)
    base.select(col("doc_id") +: carry.map(col) ++: Seq(y.as("y"),
      log(col("nt").cast("double")).as("x1"),
      meanWl.as("x2"),
      (col("ns").cast("double") / col("nt")).as("x3"),
      (col("nd").cast("double") / col("nt")).as("x4"),
      topFrac.as("x5")): _*)
  }

  /** Standardized copy of a [[featurize]] frame given sig5 moments:
    * z_j = (x_j − μ_j) / σ_j (σ < 1e-9 → 1.0, the constant-feature
    * guard, applied to the ROUNDED σ on both engines). */
  private def standardized(feats: DataFrame, mu: Array[Double],
      sigma: Array[Double], carry: Seq[String] = Nil): DataFrame =
    feats.select((col("doc_id") +: carry.map(col) :+ col("y")) ++
      (1 to K).map(j =>
        ((col(s"x$j") - lit(mu(j - 1))) / lit(sigma(j - 1)))
          .as(s"z$j")): _*)

  /** sig5-rounded standardization moments of a feature frame, with
    * the σ < 1e-9 → 1.0 guard already applied. One aggregation. */
  def moments(feats: DataFrame): (Array[Double], Array[Double]) = {
    val row = feats.agg(
      sig5(avg(col("x1"))), sig5(stddev_pop(col("x1"))),
      sig5(avg(col("x2"))), sig5(stddev_pop(col("x2"))),
      sig5(avg(col("x3"))), sig5(stddev_pop(col("x3"))),
      sig5(avg(col("x4"))), sig5(stddev_pop(col("x4"))),
      sig5(avg(col("x5"))), sig5(stddev_pop(col("x5")))).head()
    val mu = Array.tabulate(K)(j => row.getDouble(2 * j))
    val sg = Array.tabulate(K) { j =>
      val s = row.getDouble(2 * j + 1)
      if (s < 1e-9) 1.0 else s
    }
    (mu, sg)
  }

  private def dot(w: Array[Double]): Column =
    (1 to K).foldLeft(lit(w(0))) { (acc, j) =>
      acc + lit(w(j)) * col(s"z$j")
    }

  private def sigmoid(s: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-s))

  /** Full-batch GD on the logistic loss: w ← sig5(w − lr·∇/n),
    * `iters` fixed steps from w = 0. Each step is one aggregation
    * (six sums) over the cached standardized frame. */
  def train(feats: DataFrame, iters: Int = 5, lr: Double = 1.0)
      : LrModel = {
    val (mu, sg) = moments(feats)
    val z = standardized(feats, mu, sg).cache()
    try {
      val n = z.count().toDouble
      var w = Array.fill(K + 1)(0.0)
      val traj = Array.newBuilder[Array[Double]]
      for (_ <- 1 to iters) {
        val resid = sigmoid(dot(w)) - col("y")
        val g = z.agg(sum(resid).as("g0"),
          (1 to K).map(j => sum(resid * col(s"z$j")).as(s"g$j")): _*)
          .head()
        w = Array.tabulate(K + 1)(j =>
          Sig.sig5(w(j) - lr * g.getDouble(j) / n))
        traj += w
      }
      LrModel(mu, sg, traj.result())
    } finally z.unpersist()
  }

  /** The weight trajectory as a frame: (iter, feature, weight) —
    * what [[train]] learned, one row per (iteration, weight). */
  def trajectoryFrame(df: DataFrame, idCol: String, textCol: String,
      th: QualityRules.Thresholds, iters: Int = 5): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val m = train(Materialize.materialize(
      featurize(df, idCol, textCol, th)), iters)
    m.trajectory.zipWithIndex.flatMap { case (w, it) =>
      FeatureNames.zip(w).map { case (f, v) =>
        ((it + 1).toLong, f, v)
      }
    }.toSeq.toDF("iter", "feature", "weight")
      .orderBy("iter", "feature")
  }

  /** Per-doc scores under a trained model: (doc_id, label, prob)
    * with prob sig5-rounded — the map-only production scorer. */
  def scored(feats: DataFrame, m: LrModel,
      carry: Seq[String] = Nil): DataFrame =
    standardized(feats, m.mu, m.sigma, carry)
      .select(col("doc_id") +: carry.map(col) ++: Seq(
        col("y").cast("long").as("label"),
        sig5(sigmoid(dot(m.weights))).as("prob")): _*)

  /** Train-then-score in one call (the declared-query form). The
    * feature frame is MATERIALIZED first: moments + every GD
    * iteration + the final scorer each scan it (iters + 3 passes),
    * and un-materialized each pass would re-run the token folds —
    * whose expression trees CollapseProject also clones into every
    * downstream feature reference (~19 copies of the split/fold
    * tree in the collapsed scorer projection). Featurize ONCE,
    * persist the O(n·6-double) frame, run everything against it —
    * measured at 10M docs: 23.5 s for the pass, then ~1 s per
    * iteration and 1.6 s to score (BASELINE r12). */
  def trainScored(df: DataFrame, idCol: String, textCol: String,
      th: QualityRules.Thresholds, iters: Int = 5): DataFrame = {
    val feats = Materialize.materialize(
      featurize(df, idCol, textCol, th))
    scored(feats, train(feats, iters))
  }

  /** The production keep-transform (the [[QualityRules]] filterDocs
    * parity): rows of `df` whose model keep-probability clears
    * `tau` under the frozen model `m` — ONE map-only pass (the
    * featurizer + scorer fused), original columns preserved. Rows
    * without a single token score no probability and are dropped
    * (they fail the gate teacher too). */
  def filterDocs(df: DataFrame, idCol: String, textCol: String,
      th: QualityRules.Thresholds, m: LrModel,
      tau: Double = 0.5): DataFrame = {
    // every original column rides the carry lane — no join back
    // against the input (a corpus-sized semi-join), no broadcast
    val carry = df.columns.filterNot(_ == idCol).toSeq
    scored(featurize(df, idCol, textCol, th, carry), m, carry)
      .where(col("prob") >= tau)
      .select(col("doc_id").as(idCol) +: carry.map(col): _*)
  }

  /** Persist a trained model: one parquet row per weight index —
    * (j, feature, mu, sigma, weight, iters) with μ/σ NULL for the
    * bias. Train once on the corpus version, score every daily
    * batch and stream from the loaded frame (the AnnIndex persisted-
    * lifecycle contract, sized O(features) instead of O(codebook)). */
  def writeLrModel(m: LrModel, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    FeatureNames.zipWithIndex.map { case (f, j) =>
      (j.toLong, f,
        if (j == 0) None else Some(m.mu(j - 1)),
        if (j == 0) None else Some(m.sigma(j - 1)),
        m.weights(j), m.trajectory.length.toLong)
    }.toDF("j", "feature", "mu", "sigma", "weight", "iters")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted model; fails loudly on a frame whose feature
    * names do not match this build's [[FeatureNames]] (a model
    * trained by a different featurizer must not silently score). */
  def loadLrModel(spark: org.apache.spark.sql.SparkSession,
      path: String): LrModel = {
    val rows = spark.read.parquet(path).orderBy("j").collect()
    val names = rows.map(_.getString(1)).toSeq
    require(names == FeatureNames,
      s"persisted model features $names != $FeatureNames")
    LrModel(
      rows.tail.map(_.getDouble(2)),
      rows.tail.map(_.getDouble(3)),
      Array(rows.map(_.getDouble(4))))
  }

  /** Exact ROC AUC of the scores against the labels by rank-sum
    * (Mann–Whitney with average ranks for ties):
    * AUC = (Σ_{y=1} r̄ − n₊(n₊+1)/2) / (n₊·n₋).
    *
    * Scale shape: probs are sig5-rounded on [0, 1], so the grouped
    * (prob → count, positives) frame is bounded by the sig5 codomain
    * on the unit interval (< ~1.1M rows at ANY corpus size) — the
    * rank window orders that bounded frame, never corpus rows. Rank
    * terms are integers and half-integers, so the rank-sum is exact
    * in IEEE double regardless of summation order. */
  def auc(scoredDf: DataFrame): DataFrame = {
    val byP = scoredDf.groupBy("prob")
      .agg(count(lit(1)).as("c"), sum("label").as("pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("prob")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    byP.withColumn("lt", coalesce(sum("c").over(w), lit(0L)))
      .agg(
        sum(col("pos").cast("double") *
          (col("lt") + (col("c") + lit(1L)) / lit(2.0))).as("s"),
        sum("pos").as("np"), sum("c").as("n"))
      .select(col("np").cast("long").as("n_pos"),
        (col("n") - col("np")).cast("long").as("n_neg"),
        // n₊ terms in DOUBLE: n₊·(n₊+1) overflows a long at web
        // scale; doubles stay exact to 2^53 and match the oracle.
        // Single-class input → AUC undefined → NULL, not a crash
        // (ANSI divide-by-zero): a gate whose corpus is all-kept
        // must fail loudly downstream, not here.
        when(col("np") === 0L || col("np") === col("n"),
          lit(null).cast("double"))
          .otherwise(sig5((col("s") - col("np").cast("double") *
              (col("np").cast("double") + lit(1.0)) / lit(2.0))
            / (col("np").cast("double") *
              (col("n") - col("np")).cast("double")))).as("auc"))
  }

  /** Confusion matrix of the thresholded scores against the labels:
    * TP/FP/TN/FN at `tau`, plus precision, recall and F1 (via the
    * single-division identity F1 = 2·TP/(2·TP+FP+FN)), each NULL
    * when its denominator is empty. One aggregation. */
  def confusion(scoredDf: DataFrame, tau: Double = 0.5): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val pos = col("label") === 1L
    val pred = col("prob") >= tau
    scoredDf
      .agg(cnt(pos && pred).as("tp"), cnt(!pos && pred).as("fp"),
        cnt(!pos && !pred).as("tn"), cnt(pos && !pred).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        sig5(when(col("tp") + col("fp") > 0L,
          col("tp").cast("double") / (col("tp") + col("fp"))))
          .as("precision"),
        sig5(when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn"))))
          .as("recall"),
        sig5(when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          lit(2.0) * col("tp") /
            (lit(2L) * col("tp") + col("fp") + col("fn"))))
          .as("f1"))
  }

  /** Reliability table: 10 fixed probability bins → doc count, mean
    * predicted prob, empirical keep rate. O(bins) output from one
    * aggregation — the calibration curve a gate owner reads before
    * trusting the classifier's threshold. */
  def calibration(scoredDf: DataFrame): DataFrame =
    scoredDf
      .groupBy(least(floor(col("prob") * 10).cast("long"), lit(9L))
        .as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sig5(avg(col("prob"))).as("avg_prob"),
        sig5(sum("label").cast("double") / count(lit(1)))
          .as("keep_rate"))
      .orderBy("bin")
}
