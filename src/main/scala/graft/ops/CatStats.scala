package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Distribution-shape statistics for categorical columns, beyond the
  * reference's frequency tables: Shannon entropy and the normalized
  * (0..1) evenness — the corpus-balance diagnostics a training
  * pipeline reads before stratifying or re-weighting.
  *
  * Scale shape: one hash aggregation per column over its value
  * counts (map-side combined), then an O(distinct) reduction via the
  * algebraic identity H = ln n − (Σ c·ln c)/n — no per-row ln, no
  * second pass over the data, no windows. Columns are processed in
  * one union of independent (tiny) aggregates. */
object CatStats {

  /** Per-column (col_name, n, n_distinct, entropy, evenness):
    * entropy in nats over the value distribution (NULL treated as a
    * regular category), evenness = H / ln(n_distinct) (1 = uniform;
    * NULL for a single-valued column where evenness is undefined). */
  def entropy(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").as("n"), count(lit(1)).as("n_distinct"),
          sum(col("cnt").cast("double") * log(col("cnt").cast("double")))
            .as("clc"))
        .select(lit(c).as("col_name"), col("n").cast("long").as("n"),
          col("n_distinct"),
          sig5(log(col("n").cast("double")) - col("clc") / col("n"))
            .as("entropy"),
          sig5(when(col("n_distinct") > 1,
            (log(col("n").cast("double")) - col("clc") / col("n")) /
              log(col("n_distinct").cast("double"))))
            .as("evenness"))
    }.reduce(_ unionByName _).orderBy("col_name")
}
