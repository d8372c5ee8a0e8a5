package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.det.Sig.sig5

/** Embedding-QUALITY evaluation against a labeled column — the
  * checks a pipeline runs before trusting an embedding space for
  * semantic dedup, ANN retrieval, or diversity sampling. The
  * `embeddings.label` column is the ground truth (class id per
  * vector).
  *
  * Two reports:
  *  - [[knnLabelAgreement]]: k-NN majority-vote label prediction —
  *    the standard retrieval-quality probe (a good space retrieves
  *    same-class neighbors).
  *  - [[labelStats]]: per-class separability — cohesion (mean cosine
  *    of members to their class centroid) and separation (the
  *    nearest OTHER centroid's cosine): Fisher-style "are the
  *    classes blobs or soup" numbers.
  *
  * Scale shape: centroids are an O(L·dim) bounded aggregation
  * (map-side combine, shuffle volume independent of row count)
  * collected once as driver/broadcast state — the KMeansOp recompute
  * step keyed by label instead of cell; every per-vector score is
  * then a MAP-ONLY pass against the broadcast centroid map. The k-NN
  * probe composes the existing [[Similarity]] machinery (brute-force
  * here — the oracle-exact baseline; at corpus scale feed
  * [[Similarity.annTopK]]/[[Similarity.ivfTopK]] instead, identical
  * downstream vote).
  *
  * Determinism: votes and argmax picks compare integers (exact);
  * every cosine is sig5-rounded before any average or ranking;
  * centroid-vs-centroid decisions rank rounded values with label
  * tie-break (the engine contract). */
object EmbedEval {

  /** k-NN label agreement: for each query row (`idCol` <
    * `numQueries`), retrieve the k nearest neighbors by exact cosine
    * and majority-vote their labels (ties → smaller label id).
    * Returns (query_id, true_label, pred_label, n_votes, correct)
    * ordered by query_id. `n_votes` is the winning label's neighbor
    * count — a confidence proxy. */
  def knnLabelAgreement(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, numQueries: Int = 20, k: Int = 10)
      : DataFrame = {
    val nb = Similarity.cosineTopK(df, idCol, vecCol, numQueries, k)
    val lbl = df.select(col(idCol).as("neighbor_id"),
      col(labelCol).cast("long").as("label"))
    // vote counts are integers: the (count DESC, label ASC) argmax
    // is exact on both engines — encoded as max over a
    // lexicographic (cnt, −label) struct, no window
    val pred = nb.join(lbl, "neighbor_id")
      .groupBy("query_id", "label").agg(count(lit(1)).as("cnt"))
      .groupBy("query_id")
      .agg(max(struct(col("cnt"),
        (-col("label")).as("nl"))).as("w"))
      .select(col("query_id"), col("w.cnt").as("n_votes"),
        (-col("w.nl")).as("pred_label"))
    val truth = df.where(col(idCol) < numQueries)
      .select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("true_label"))
    pred.join(truth, "query_id")
      .select(col("query_id"), col("true_label"), col("pred_label"),
        col("n_votes"),
        (col("true_label") === col("pred_label")).as("correct"))
      .orderBy("query_id")
  }

  /** Cluster purity: assign every vector to its nearest seed
    * centroid (the [[KMeansOp]] seeded cells — corpus rows
    * [seedLo, seedHi), one pure-assignment round so the whole
    * computation is closed-form) and report, per cell, how label-
    * homogeneous it is: (cluster_id, n, top_label, top_n, purity).
    * THE check that a clustering used for SemDeDup-style semantic
    * dedup or diversity sampling actually tracks the semantic
    * classes — purity ≈ 1 means cell-scoped decisions are
    * class-scoped decisions.
    *
    * Scale shape: the map-only assignment pass (broadcast codebook,
    * no shuffle) + one (cell, label) count aggregation; the argmax
    * is the same windowless integer struct-max as
    * [[knnLabelAgreement]]. */
  def clusterPurity(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, seedLo: Long, seedHi: Long, dim: Int = 64)
      : DataFrame = {
    val base = df.where(size(col(vecCol)) === dim)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
    val assigned = KMeansOp.assignCells(base,
      KMeansOp.seedCentroids(base, seedLo, seedHi))
      .select(col("vid"), col("cell"))
      .join(df.select(col(idCol).as("vid"),
        col(labelCol).cast("long").as("label")), "vid")
    assigned.groupBy("cell", "label").agg(count(lit(1)).as("cnt"))
      .groupBy(col("cell").as("cluster_id"))
      .agg(sum(col("cnt")).as("n"),
        max(struct(col("cnt"), (-col("label")).as("nl"))).as("w"))
      .select(col("cluster_id"), col("n"),
        (-col("w.nl")).as("top_label"), col("w.cnt").as("top_n"),
        sig5(col("w.cnt").cast("double") / col("n")).as("purity"))
      .orderBy("cluster_id")
  }

  /** Per-class separability report: (label, n, cohesion, nn_label,
    * separation) — cohesion = mean sig5-rounded cosine of members to
    * their class centroid; nn_label/separation = the nearest OTHER
    * class centroid by rounded cosine (ties → smaller label) and its
    * value. Healthy embeddings show cohesion ≫ separation. */
  def labelStats(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val base = df.where(size(col(vecCol)) === dim)
      .select(col(idCol).as("vid"), col(vecCol).as("v"),
        col(labelCol).cast("long").as("label"))
    // per-label centroids: the KMeansOp recompute step keyed by
    // label — bounded shuffle, O(L·dim) driver state
    val cents = KMeansOp.recomputeCentroids(
      base.select(col("label").as("cell"), col("v")), dim)
    require(cents.nonEmpty, "no labeled vectors")
    val centMap = typedLit(cents.map { case (l, cv) =>
      l -> cv.toSeq }.toMap)
    // map-only cohesion pass against the broadcast centroid map
    val c = element_at(centMap, col("label"))
    val coh = base.select(col("label"),
        sig5(Similarity.cosine(Similarity.dot(col("v"), c),
          Similarity.norm(col("v")), Similarity.norm(c))).as("coh"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sig5(avg(col("coh"))).as("cohesion"))
    // centroid-vs-centroid separation: O(L²) driver arithmetic on
    // the collected codebook (L tiny), rounded-decision argmax
    def dotA(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var d = 0
      while (d < a.length) { s += a(d) * b(d); d += 1 }
      s
    }
    val sepRows = cents.map { case (l, cv) =>
      val nl = math.sqrt(dotA(cv, cv))
      val others = cents.filter(_._1 != l).flatMap { case (m, mv) =>
        val nm = math.sqrt(dotA(mv, mv))
        if (nl > 0.0 && nm > 0.0)
          Some((Sig.sig5Col(dotA(cv, mv) / (nl * nm)), m))
        else None
      }
      if (others.isEmpty) (l, None: Option[Long], None: Option[Double])
      else {
        val best = others.minBy { case (cos, m) => (-cos, m) }
        (l, Some(best._2), Some(best._1))
      }
    }.toSeq
    import spark.implicits._
    val sep = sepRows.toDF("label", "nn_label", "separation")
    coh.join(sep, "label")
      .select(col("label"), col("n"), col("cohesion"),
        col("nn_label"), col("separation"))
      .orderBy("label")
  }

  /** Per-DIMENSION embedding health report — the "is this embedding
    * column usable" scan run before any ANN/dedup/clustering work:
    * per dimension (0-based) n/mean/std/min/max plus the zero
    * fraction and a dead-dimension flag (sig5-rounded std below
    * 1e-9 — a constant coordinate carries no signal and silently
    * wastes index bits), and one summary row at `dim_idx = -1` with
    * the same statistics over the per-vector L2 NORM (zero-norm
    * vectors there are undeduplicatable/unsearchable rows).
    *
    * Scale shape: the per-dim block posexplodes to dim× rows but
    * partial aggregation folds each partition to O(dim) groups
    * before the shuffle (dim groups total, independent of N); the
    * norm block is a map-only array fold into one single-row
    * aggregate. Two parallel scans, no joins, no windows.
    *
    * Determinism: raw per-dim min/max are exact data values
    * (unrounded); every computed statistic (mean/std/zero-fraction
    * and ALL norm-row stats — norms are computed floats) is
    * sig5-rounded; the dead flag compares the ROUNDED std so both
    * engines decide on identical doubles. */
  def dimProfile(df: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val base = df.where(size(col(vecCol)) === dim)
    val ex = base.select(
      posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "v")))
    val perDim = ex.groupBy(col("p").cast("long").as("dim_idx"))
      .agg(count(col("v")).as("n"),
        sig5(avg(col("v"))).as("mean"),
        sig5(stddev_samp(col("v"))).as("std"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"),
        sig5(count(when(col("v") === 0.0, 1)).cast("double") /
          count(col("v")).cast("double")).as("p_zero"))
      .withColumn("is_dead",
        when(col("std") < 1e-9, 1L).otherwise(0L))
    val norms = base.select(sqrt(aggregate(
      transform(col(vecCol), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)).as("norm"))
    val normRow = norms.agg(count(col("norm")).as("n"),
        sig5(avg(col("norm"))).as("mean"),
        sig5(stddev_samp(col("norm"))).as("std"),
        sig5(min(col("norm"))).as("min_val"),
        sig5(max(col("norm"))).as("max_val"),
        sig5(count(when(col("norm") === 0.0, 1)).cast("double") /
          count(col("norm")).cast("double")).as("p_zero"))
      .select(lit(-1L).as("dim_idx"), col("n"), col("mean"),
        col("std"), col("min_val"), col("max_val"), col("p_zero"),
        lit(0L).as("is_dead"))
    perDim.select(col("dim_idx"), col("n"), col("mean"), col("std"),
        col("min_val"), col("max_val"), col("p_zero"), col("is_dead"))
      .unionAll(normRow)
      .orderBy("dim_idx")
  }

  /** Embedding-space ANISOTROPY: the fraction of total variance the
    * top principal component explains (Ethayarajh-style "is the
    * space a cone" diagnostic — an anisotropic space degrades cosine
    * retrieval and near-dup thresholds; measure it BEFORE trusting
    * the ANN/semantic-dedup families). λ₁ is obtained by `iters`
    * rounds of power iteration on the covariance matrix.
    *
    * Scale shape: the covariance needs exactly the first and second
    * moments — Σxᵢ and Σxᵢxⱼ for i ≤ j — computed as a WIDE
    * single-row scalar aggregation (dim + dim(dim+1)/2 codegen'd
    * avg() expressions, full map-side combine: shuffle = one row of
    * O(dim²) doubles regardless of N, NO explode / self-join
    * anywhere near the data). The expression count is superlinear
    * for Catalyst, so [[graft.profiler.Stats.chunkedAggPar]] splits
    * it into bounded CONCURRENT scans (dim 64 → 2145 aggs → 5 jobs).
    * The O(dim²) matrix and the iteration itself are driver
    * arithmetic — the same bounded-collect pattern as the k-means /
    * PQ codebooks.
    *
    * Determinism: each covariance entry is sig5-rounded (the cross-
    * engine canon — both engines iterate IDENTICAL matrices); inside
    * the iteration plain double arithmetic diverges only at the
    * summation-order 1e-15 level, then λ₁/trace/explained are
    * sig5-rounded on emission (the bench-family argument: divergence
    * ~1e7 below the rounding bucket). The all-ones start vector is
    * fixed, so there is no RNG anywhere. */
  def anisotropy(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 4, chunk: Int = 512): DataFrame = {
    require(iters >= 1 && dim >= 2, "need iters >= 1, dim >= 2")
    val base = df.where(size(col(vecCol)) === dim)
      .select(col(vecCol).cast("array<double>").as("v"))
    def e(i: Int) = element_at(col("v"), i + 1)
    val aggs = count(lit(1)).as("n__") +:
      ((0 until dim).map(i => avg(e(i)).as(s"m__$i")) ++
        (for (i <- 0 until dim; j <- i until dim)
          yield avg(e(i) * e(j)).as(s"p__${i}_$j")))
    val m = graft.profiler.Stats.chunkedAggPar(base, aggs, chunk)
    val n = m("n__").asInstanceOf[Long]
    require(n > 0, "no vectors of the declared dimension")
    val mu = Array.tabulate(dim)(i => m(s"m__$i").asInstanceOf[Double])
    val cov = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val c = Sig.sig5(
        m(s"p__${i}_$j").asInstanceOf[Double] - mu(i) * mu(j))
      cov(i)(j) = c; cov(j)(i) = c
    }
    def matvec(x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += cov(i)(j) * x(j); j += 1 }
        s
      }
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    // degenerate corpus (all vectors identical → zero covariance):
    // report zero variance structure instead of crashing — a
    // diagnostic must survive the pathologies it diagnoses
    val lambda =
      if (trace <= 0.0) 0.0
      else {
        var v = Array.fill(dim)(1.0)
        var it = 0
        while (it < iters) {
          val w = matvec(v)
          val nn = math.sqrt(w.map(x => x * x).sum)
          // Cv = 0 only when v is in the null space; the all-ones
          // start escaping to exactly null measure-zero — restart
          // direction e_it if it happens
          v = if (nn > 0.0) w.map(_ / nn)
          else Array.tabulate(dim)(i => if (i == it % dim) 1.0 else 0.0)
          it += 1
        }
        val cv = matvec(v)
        (0 until dim).map(i => v(i) * cv(i)).sum
      }
    val explained = if (trace <= 0.0) 0.0 else lambda / trace
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, dim.toLong, Sig.sig5(trace), Sig.sig5(lambda),
        Sig.sig5(explained), iters.toLong))
      .toDF("n_vectors", "dim", "trace", "lambda1", "explained",
        "iters")
  }
}
