package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Deterministic seeded k-means (Lloyd's algorithm, fixed iteration
  * count) over an embedding column — the clustering primitive behind
  * IVF index training, corpus domain discovery, and diversity-aware
  * sampling.
  *
  * Initialization uses designated corpus rows as seed centroids
  * (like [[Similarity.ivfTopK]]'s codebook), so there is no RNG and
  * the whole computation — including the oracle's — is a pure
  * function of the data.
  *
  * Scale shape per iteration: centroids are O(k·d) and live on the
  * driver/broadcast (collected once per iteration — the standard
  * Lloyd structure; k·d doubles, never data-sized). Assignment is a
  * MAP-ONLY pass — per row, argmin over k inline codegen'd
  * `array_dot` scores via a sorted struct array (no shuffle, no row
  * expansion). Centroid recomputation is one posexplode + (cell, dim)
  * aggregation with map-side combine: shuffle volume k·d·partitions,
  * independent of row count.
  *
  * Determinism contract: the argmin ranks sig5-ROUNDED scores
  * (|c|² − 2·v·c, the per-row-constant |v|² dropped) with centroid-id
  * tie-break — identical decisions across engines even though
  * centroid averages differ by an ulp. The reported WCSS sums the
  * rounded assignment score plus the raw |v|² and is sig5-rounded
  * again after aggregation. Clusters left empty after an iteration
  * drop out (standard Lloyd behavior), identically in both engines. */
object KMeansOp {

  /** (vid, v) base frame: rows with a well-formed `dim`-vector. */
  private[ops] def vecBase(df: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame =
    df.where(size(col(vecCol)) === dim)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))

  /** Seed centroids: designated corpus rows with id in
    * [seedLo, seedHi), keyed by their row id — no RNG anywhere. */
  private[ops] def seedCentroids(base: DataFrame, seedLo: Long,
      seedHi: Long): Array[(Long, Array[Double])] = {
    val cents = base
      .where(col("vid") >= seedLo && col("vid") < seedHi)
      .select(col("vid"), col("v").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, s"no seed rows with id in [$seedLo, $seedHi)")
    cents
  }

  /** Map-only nearest-centroid assignment: (vid, v, cell, score),
    * argmin over sig5-rounded |c|²−2·v·c with centroid-id tie-break
    * (see object scaladoc for the determinism contract). */
  private[ops] def assignCells(base: DataFrame,
      cs: Array[(Long, Array[Double])]): DataFrame = {
    val cellStructs = cs.map { case (cid, cv) =>
      val cn2 = cv.map(x => x * x).sum
      struct(
        sig5(lit(cn2) - lit(2.0) * graft.functions.ArrayDot
          .array_dot(col("v"), typedLit(cv))).as("score"),
        lit(cid).as("cid"))
    }
    base.select(col("vid"), col("v"),
        array_sort(array(cellStructs: _*)).as("cells"))
      .select(col("vid"), col("v"),
        element_at(col("cells"), 1).getField("cid").as("cell"),
        element_at(col("cells"), 1).getField("score").as("score"))
  }

  /** The Lloyd recompute step: per-(cell, dim) average of the
    * assigned vectors, collected as the next O(k·d) driver codebook
    * (shuffle volume k·d·partitions, independent of row count).
    * Cells left empty drop out. Shared by [[kmeansStats]],
    * [[kmeansConvergence]] and the trained-codebook paths. */
  private[ops] def recomputeCentroids(a: DataFrame, dim: Int)
      : Array[(Long, Array[Double])] = a
    .select(col("cell"), posexplode(col("v")).as(Seq("p", "vf")))
    .groupBy(col("cell"), col("p"))
    .agg(avg(col("vf").cast("double")).as("m"))
    .groupBy("cell")
    .agg(map_from_arrays(collect_list(col("p")),
      collect_list(col("m"))).as("dims"))
    .collect()
    .map { r =>
      val m = r.getMap[Int, Double](1)
      (r.getLong(0), Array.tabulate(dim)(m(_)))
    }
    .sortBy(_._1)

  /** Seed centroids refined by `iters − 1` Lloyd rounds — the
    * trained full-width codebook the IVF family feeds to its cell
    * assignment (iters = 1 ≡ the raw seeds). */
  private[ops] def trainedCentroids(base: DataFrame, seedLo: Long,
      seedHi: Long, dim: Int, iters: Int)
      : Array[(Long, Array[Double])] = {
    require(iters >= 1, "iters must be >= 1")
    var cents = seedCentroids(base, seedLo, seedHi)
    for (_ <- 1 until iters)
      cents = recomputeCentroids(assignCells(base, cents), dim)
    cents
  }

  /** Per-cluster report after `iters` Lloyd iterations from the seed
    * rows with id in [seedLo, seedHi): (cluster_id, n_members, wcss).
    * Every corpus row (any id) participates in every assignment. */
  def kmeansStats(df: DataFrame, idCol: String, vecCol: String,
      seedLo: Long, seedHi: Long, iters: Int = 2, dim: Int = 64)
      : DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val base = vecBase(df, idCol, vecCol, dim)
    val fin = assignCells(base,
      trainedCentroids(base, seedLo, seedHi, dim, iters))
    fin.select(col("cell"), col("score"),
        graft.functions.ArrayDot.array_dot(col("v"), col("v")).as("vn2"))
      .groupBy(col("cell").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sig5(sum(col("score") + col("vn2"))).as("wcss"))
      .orderBy("cluster_id")
  }

  /** The Lloyd convergence contract as data: one row per iteration —
    * (iter, n_clusters, inertia, center_shift) — where inertia is the
    * WCSS of that iteration's assignment (sig5-rounded sum of the
    * rounded assignment score + raw |v|², the [[kmeansStats]] wcss
    * formula) and center_shift is the summed squared movement
    * ‖c_i − c_{i−1}‖² of the surviving centroids (NULL on the first
    * iteration — there is no previous codebook). Lloyd guarantees
    * inertia is non-increasing across iterations (each reassignment
    * and each recompute step is a monotone improvement); emitting the
    * trajectory makes that contract INSPECTABLE — the number a user
    * reads to size `iters` (stop when the shift is negligible).
    *
    * Scale shape per iteration: the same map-only assignment +
    * bounded recompute as [[kmeansStats]], plus one O(rows)
    * aggregation for the inertia (map-side combined, 1-row result);
    * the shift is O(k·d) driver arithmetic on the collected
    * codebooks. Everything is a closed-form function of the data —
    * the oracle replays the iterations relationally. */
  def kmeansConvergence(df: DataFrame, idCol: String, vecCol: String,
      seedLo: Long, seedHi: Long, iters: Int = 2, dim: Int = 64)
      : DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = df.sparkSession
    val base = vecBase(df, idCol, vecCol, dim)
    var cents = seedCentroids(base, seedLo, seedHi)
    val rows = Seq.newBuilder[(Long, Long, Double, Option[Double])]
    var shift: Option[Double] = None
    for (it <- 1 to iters) {
      val a = assignCells(base, cents)
      val stats = a.select(col("cell"), col("score"),
          graft.functions.ArrayDot.array_dot(col("v"), col("v"))
            .as("vn2"))
        .agg(countDistinct(col("cell")).as("n_clusters"),
          sig5(sum(col("score") + col("vn2"))).as("inertia"))
        .collect()(0)
      rows += ((it.toLong, stats.getLong(0), stats.getDouble(1), shift))
      if (it < iters) {
        val prev = cents.toMap
        cents = recomputeCentroids(a, dim)
        shift = Some(graft.det.Sig.sig5(cents.map { case (cid, cv) =>
          val pv = prev(cid)
          var s = 0.0; var d = 0
          while (d < dim) { val t = cv(d) - pv(d); s += t * t; d += 1 }
          s
        }.sum))
      }
    }
    import spark.implicits._
    rows.result().toDF("iter", "n_clusters", "inertia", "center_shift")
      .orderBy("iter")
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al.,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", 2023): cluster the embedding space, then compare
    * pairs ONLY within a cluster — the clustering bounds the
    * quadratic pair blow-up that makes all-pairs cosine infeasible,
    * which is the paper's whole point. Emits
    * (cluster_id, id_a, id_b, cosine) for within-cluster pairs whose
    * sig5-rounded cosine ≥ `minCosine` (keep-one policy: drop the
    * higher id of each pair, exactly like the n-gram dedup family).
    *
    * Scale shape: assignment is the map-only seeded-centroid pass
    * (no shuffle); the pair join shuffles on the cell key, and the
    * per-cell all-pairs cost C(m,2) is the knob you size with k
    * (SemDeDup uses k large enough that clusters stay comparison-
    * sized). `maxCluster` is the adversarial-cell guard — the same
    * star cap as `Dedup.bandedCandidates`: a near-duplicate-heavy
    * corpus (the exact case SemDeDup targets) concentrates mass in
    * few cells, and an over-cap cell switches from all-pairs to STAR
    * linking (every member paired with the cell's minimum id — m−1
    * edges instead of C(m,2)). The star preserves the connectivity
    * that keep-one clustering consumes (all members reachable
    * through the rep) at the cost of pair-level recall for member
    * pairs whose direct star edge scores below `minCosine` —
    * acceptable for over-cap cells, which are near-identical blobs
    * by construction. One Lloyd iteration (pure seed assignment)
    * keeps the whole computation a closed-form function of the data,
    * which the oracle re-derives — including the cap. */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
      seedLo: Long, seedHi: Long, dim: Int = 64,
      minCosine: Double = 0.9,
      maxCluster: Option[Long] = None): DataFrame = {
    val base = vecBase(df, idCol, vecCol, dim)
    val a = assignCells(base, seedCentroids(base, seedLo, seedHi))
      .select(col("vid"), col("v"),
        sqrt(graft.functions.ArrayDot.array_dot(col("v"), col("v")))
          .as("nrm"), col("cell"))
    val pairs = maxCluster match {
      case None =>
        val x = a.select(col("cell"), col("vid").as("id_a"),
          col("v").as("va"), col("nrm").as("na"))
        val y = a.select(col("cell"), col("vid").as("id_b"),
          col("v").as("vb"), col("nrm").as("nb"))
        x.join(y, Seq("cell")).where(col("id_a") < col("id_b"))
      case Some(cap) =>
        // size, star representative (min vid — so rep < id_b holds
        // for every star edge) and the rep's vector all come from
        // windows over ONE cell-partitioned exchange: no extra
        // aggregation, no join back, and the expensive assignment
        // projection is evaluated once per branch with the shuffle
        // itself deduplicated by exchange reuse. Per-cell window work
        // is LINEAR in the cell (the quadratic all-pairs is what the
        // cap removes), same bound as the pair join's own cell
        // partitioning.
        import org.apache.spark.sql.expressions.Window
        val byCell = Window.partitionBy("cell")
        val byCellOrd = Window.partitionBy("cell").orderBy("vid")
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)
        val w = a.select(col("cell"), col("vid"), col("v"), col("nrm"),
          count(lit(1)).over(byCell).as("sz"),
          min("vid").over(byCell).as("rep"),
          first("v").over(byCellOrd).as("repv"),
          first("nrm").over(byCellOrd).as("repn"))
        val small = w.where(col("sz") <= cap)
        val x = small.select(col("cell"), col("vid").as("id_a"),
          col("v").as("va"), col("nrm").as("na"))
        val y = small.select(col("cell"), col("vid").as("id_b"),
          col("v").as("vb"), col("nrm").as("nb"))
        val smallPairs =
          x.join(y, Seq("cell")).where(col("id_a") < col("id_b"))
        val starPairs = w
          .where(col("sz") > cap && col("vid") =!= col("rep"))
          .select(col("cell"), col("rep").as("id_a"),
            col("repv").as("va"), col("repn").as("na"),
            col("vid").as("id_b"), col("v").as("vb"),
            col("nrm").as("nb"))
        smallPairs.unionByName(starPairs)
    }
    pairs
      .select(col("cell").as("cluster_id"), col("id_a"), col("id_b"),
        sig5(graft.functions.ArrayDot.array_dot(col("va"), col("vb")) /
          (col("na") * col("nb"))).as("cosine"))
      .where(col("cosine") >= minCosine)
      .orderBy("cluster_id", "id_a", "id_b")
  }
}
