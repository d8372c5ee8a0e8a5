package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.det.Sig.sig5
import graft.functions.ArrayDot.array_dot

/** Johnson–Lindenstrauss random projection — the cheap
  * dimensionality-reduction stage a 100 TB similarity pipeline runs
  * BEFORE LSH banding or IVF training when embeddings are wide
  * (e.g. 1024-d): a ±1/√k sign matrix preserves pairwise distances
  * within (1±ε) with k = O(log n / ε²) output dims (Achlioptas 2003's
  * database-friendly variant — signs, no Gaussians), so every
  * downstream bucket/probe pays k-dim arithmetic instead of dim-dim.
  *
  * Scale shape: the projection is MAP-ONLY — the k×dim sign matrix
  * is deterministic driver state (an LCG over the flat matrix index;
  * no RNG, any executor can regenerate it), shipped as k array
  * literals through the native codegen'd `array_dot`; no shuffle, no
  * explode of the input vector. The distortion report is the bounded
  * self-join shape over a small id-prefix sample (the repo's
  * numQueries convention): O(sample²) scored pairs, never corpus².
  *
  * Determinism: signs are exact integer arithmetic on both engines;
  * projected values and distance ratios are sig5-rounded on emission
  * (engines differ only in summation association, ~1e-16). */
object Projection {

  /** ±1 sign for matrix cell (d, o): an xor-mix of two Knuth/xxHash
    * multiplicative hashes of the flat index, exact in 64-bit
    * integer arithmetic and replayable in any SQL engine. NOT a
    * bare-LCG parity: with an odd multiplier `h % 2` equals
    * `(idx+1) % 2`, and with an even `outDim` that makes every
    * output row a CONSTANT sign — a rank-1 "projection" (caught by
    * the EmbedHealthSpec isometry test). The mixed bit measures
    * flat-balanced (0.500 over 64×16) with mean pairwise distance
    * ratio 0.99 on isotropic data. */
  def rpSign(d: Int, o: Int, outDim: Int): Double = {
    val i = d.toLong * outDim + o
    val h = (((i * 0x9E3779B9L) ^ ((i * 0x85EBCA6BL) >> 13)) >> 7) & 1L
    if (h == 0L) 1.0 else -1.0
  }

  /** The k×dim projection matrix, rows scaled by 1/√k. */
  def rpMatrix(dim: Int, outDim: Int): Array[Array[Double]] = {
    val s = math.sqrt(outDim.toDouble)
    Array.tabulate(outDim)(o =>
      Array.tabulate(dim)(d => rpSign(d, o, outDim) / s))
  }

  private def base(df: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame =
    df.where(size(col(vecCol)) === dim)
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))

  /** Project to `outDim` dims: one scalar row per (vec_id, out_dim)
    * with the sig5-rounded coordinate. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int): DataFrame = {
    val m = rpMatrix(dim, outDim)
    val rows = (0 until outDim).map { o =>
      struct(lit(o.toLong).as("out_dim"),
        sig5(array_dot(col("v"), lit(m(o)))).as("y"))
    }
    base(df, idCol, vecCol, dim)
      .select(col("vec_id"), explode(array(rows: _*)).as("s"))
      .select(col("vec_id"), col("s.out_dim"), col("s.y"))
      .orderBy("vec_id", "out_dim")
  }

  /** Distance-distortion report over the `sampleIds` id-prefix
    * sample: for every pair a < b, ratio = ‖proj(a)−proj(b)‖² /
    * ‖a−b‖². Emits one summary row — n_pairs, mean/min/max ratio and
    * the fraction inside [1−eps, 1+eps] — the accept/reject number a
    * pipeline checks before trusting the reduced space. */
  def rpDistortion(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, sampleIds: Long = 48L,
      eps: Double = 0.5): DataFrame = {
    val m = rpMatrix(dim, outDim)
    val b = base(df, idCol, vecCol, dim)
      .where(col("vec_id") < sampleIds)
    def proj(v: Column): Column =
      array((0 until outDim).map(o => array_dot(v, lit(m(o)))): _*)
    val withP = b.select(col("vec_id"), col("v"), proj(col("v")).as("p"))
    val l = withP.select(col("vec_id").as("ida"), col("v").as("va"),
      col("p").as("pa"))
    val r = withP.select(col("vec_id").as("idb"), col("v").as("vb"),
      col("p").as("pb"))
    def d2(a: Column, bb: Column): Column =
      aggregate(zip_with(a, bb, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    // identical-vector pairs (planted near-dups) have zero original
    // distance — excluded, a ratio is undefined there
    val pairs = l.join(broadcast(r), col("ida") < col("idb"))
      .select(d2(col("pa"), col("pb")).as("dp"),
        d2(col("va"), col("vb")).as("dv"))
      .where(col("dv") > 0.0)
      .select(sig5(col("dp") / col("dv")).as("ratio"))
    pairs.agg(count(lit(1)).as("n_pairs"),
      sig5(avg(col("ratio"))).as("mean_ratio"),
      sig5(min(col("ratio"))).as("min_ratio"),
      sig5(max(col("ratio"))).as("max_ratio"),
      sig5(count(when(col("ratio") >= 1.0 - eps &&
          col("ratio") <= 1.0 + eps, 1)).cast("double") /
        count(lit(1)).cast("double")).as("p_within_eps"))
  }
}
