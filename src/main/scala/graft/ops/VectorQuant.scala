package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Scalar int8 quantization of an embedding column — the standard
  * 4× storage/bandwidth compression for vector search at corpus
  * scale (each float32 dimension mapped to an unsigned 8-bit code
  * against per-dimension min/max bounds).
  *
  * Scale shape: pass 1 computes the 2·dim bound scalars by exploded
  * aggregation (map-side combine; shuffle volume = partitions × dim,
  * independent of row count); pass 2 is a map-only encode against the
  * broadcast bounds. Reconstruction-error stats prove the codec's
  * quality contract (max abs error ≤ half a quantization step).
  *
  * Determinism contract: the code is floor(x + 0.5) on a double both
  * engines computed from IDENTICAL inputs with correctly-rounded
  * IEEE ops (min, max, subtraction, division) — floor is exact, so
  * codes are bit-identical across engines with NO rounding guard;
  * only the error AGGREGATES (different summation order) go through
  * sig5. */
object VectorQuant {

  /** Per-dimension quantization report over `vecCol`
    * (array<float>, 1-based dim index): bounds, the quantization
    * step, mean/max absolute reconstruction error, and the count of
    * distinct codes used — one row per dimension. */
  def quantizeStats(df: DataFrame, vecCol: String, dim: Int)
      : DataFrame = {
    val el = df.where(size(col(vecCol)) === dim)
      .select(posexplode(col(vecCol)).as(Seq("p", "vf")))
      .select((col("p") + 1).cast("long").as("i"),
        col("vf").cast("double").as("v"))
    val bounds = el.groupBy("i")
      .agg(min("v").as("mn"), max("v").as("mx"))
      .withColumn("step", (col("mx") - col("mn")) / 255.0)
    val coded = el.join(broadcast(bounds), Seq("i"))
      .withColumn("q",
        when(col("step") > 0.0,
          least(greatest(
            floor((col("v") - col("mn")) / col("step") + 0.5), lit(0.0)),
            lit(255.0)).cast("long"))
          .otherwise(0L))
      .withColumn("err",
        abs(col("v") - (col("mn") + col("q") * col("step"))))
    // mn/mx/step are constant within a dimension group (first is
    // deterministic); max(err) compares identical doubles so it needs
    // no rounding — only avg(err) sums in engine-specific order
    coded.groupBy("i")
      .agg(first("mn").as("mn"), first("mx").as("mx"),
        first("step").as("step"),
        sig5(avg("err")).as("avg_abs_err"),
        max("err").as("max_abs_err"),
        countDistinct(col("q")).as("n_codes"))
      .orderBy("i")
  }
}
