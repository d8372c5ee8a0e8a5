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

  /** Per-cluster report after `iters` Lloyd iterations from the seed
    * rows with id in [seedLo, seedHi): (cluster_id, n_members, wcss).
    * Every corpus row (any id) participates in every assignment. */
  def kmeansStats(df: DataFrame, idCol: String, vecCol: String,
      seedLo: Long, seedHi: Long, iters: Int = 2, dim: Int = 64)
      : DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val base = df.where(size(col(vecCol)) === dim)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
    // seed centroids: designated corpus rows, keyed by their row id
    var cents: Array[(Long, Array[Double])] = base
      .where(col("vid") >= seedLo && col("vid") < seedHi)
      .select(col("vid"), col("v").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, s"no seed rows with id in [$seedLo, $seedHi)")

    def assigned(cs: Array[(Long, Array[Double])]): DataFrame = {
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

    // iters−1 reassign→recompute rounds; the final assignment feeds
    // the report directly
    for (_ <- 1 until iters) {
      val a = assigned(cents)
      cents = a
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
    }
    val fin = assigned(cents)
    fin.select(col("cell"), col("score"),
        graft.functions.ArrayDot.array_dot(col("v"), col("v")).as("vn2"))
      .groupBy(col("cell").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sig5(sum(col("score") + col("vn2"))).as("wcss"))
      .orderBy("cluster_id")
  }
}
