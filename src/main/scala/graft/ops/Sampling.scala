package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / train-val splitting for training-data
  * pipelines. Two paths with different scale shapes:
  *
  *  - [[stratifiedExact]]: exact per-stratum fractions via window
  *    ranking — fully reproducible AND oracle-expressible, but pays a
  *    per-stratum sort shuffle; the right tool at audit/test scale or
  *    when exact stratum counts are contractual.
  *  - [[hashSplit]]: map-only assignment from a seeded xxhash64 of
  *    the id — no shuffle, no sort, stable under repartitioning and
  *    insertion order, the 100 TB path. Fractions are approximate
  *    (binomial around the target), which is what production splits
  *    accept in exchange for O(1) per-row cost.
  */
object Sampling {

  /** Exact deterministic stratified sample: the ceil(frac·n) lowest
    * `idCol` rows of every stratum. One shuffle (window partition by
    * stratum); ties impossible for unique ids. */
  def stratifiedExact(df: DataFrame, stratumCol: String, idCol: String,
      frac: Double): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(col(idCol))
    val wc = Window.partitionBy(stratumCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .where(col("__rn") <= ceil(col("__cnt") * lit(frac)))
      .drop("__rn", "__cnt")
  }

  /** Map-only deterministic split assignment: bucket = seeded
    * xxhash64(id) taken non-negative mod `buckets`. A row's bucket
    * never changes across runs, partitionings, or cluster sizes, so
    * downstream train/val/test membership is stable forever —
    * `pmod` keeps ANSI mode happy on Long.MinValue. */
  def splitBucket(id: Column, buckets: Int, seed: Long = 42L): Column =
    pmod(xxhash64(lit(seed), id), lit(buckets.toLong))

  /** Split a frame into (train, holdout) by hashed id:
    * `holdoutPerMille` of 1000 buckets go to the holdout side. */
  def hashSplit(df: DataFrame, idCol: String, holdoutPerMille: Int,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val b = splitBucket(col(idCol), 1000, seed)
    (df.where(b >= holdoutPerMille), df.where(b < holdoutPerMille))
  }

  private val MinstdM = 2147483647L // 2^31 − 1 (MINSTD modulus)
  private val MinstdA = 48271L

  /** Deterministic pseudo-random mille bucket in [0, 1000) from a row
    * id via two MINSTD (Lehmer) steps — pure BIGINT arithmetic, so
    * unlike xxhash64 it is re-derivable in ANY SQL engine (the
    * oracle recomputes it exactly). pmod bounds the id first, keeping
    * every product < 2³¹·48271 ≪ 2⁶³: no ANSI overflow for any id. */
  def minstdMille(id: Column): Column = {
    val h0 = pmod(id + 12345L, lit(MinstdM))
    val h1 = pmod(h0 * MinstdA, lit(MinstdM))
    val h2 = pmod(h1 * MinstdA, lit(MinstdM))
    pmod(h2, lit(1000L))
  }

  /** Per-row weighted subsampling: keep a row iff its deterministic
    * mille bucket falls under floor(weight·1000) — rows with weight
    * ≥ 1 always survive, weight ≤ 0 never. The acceptance decision is
    * a map-only row-local predicate (no shuffle, stable under
    * repartitioning), the quality-proportional sampling stage of a
    * corpus pipeline. Returns the kept rows with the bucket and
    * threshold exposed for audit. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column)
      : DataFrame = {
    val m = minstdMille(col(idCol))
    val thr = floor(weight * 1000.0).cast("long")
    df.withColumn("mille", m)
      .withColumn("w_mille", thr)
      .where(col("mille") < col("w_mille"))
  }
}
