package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Profiling for nested ARRAY columns (the reference leaves nested
  * types unprofiled — SURVEY.md §1.2): container-level length
  * statistics in one pass plus element-level moments through the
  * explode Generator (Spark's UDTF surface). Both aggregates are
  * tiny; the explode pass shuffles nothing (global agg, partial/final
  * combine). MapType columns profile the same way via map_entries →
  * explode; no map column exists in the test fixtures. */
object ArrayStats {

  /** MapType profiling: per-key frequency (top `topK` keys) plus
    * numeric value stats, through map_entries → explode. One scan,
    * one small groupBy — same shape as the array path. */
  def mapProfile(df: DataFrame, mapCol: String, topK: Int = 10)
      : DataFrame = {
    val entries = df
      .select(explode(map_entries(col(mapCol))).as("e"))
      .select(col("e.key").cast("string").as("key"),
        col("e.value").cast("double").as("value"))
    entries.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sig5(avg("value")).as("avg_value"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
  }

  def profile(df: DataFrame, arrCol: String): DataFrame = {
    val lens = df.agg(
      count(col(arrCol)).as("n_arrays"),
      sig5(avg(size(col(arrCol)))).as("avg_len"),
      min(size(col(arrCol))).cast("long").as("min_len"),
      max(size(col(arrCol))).cast("long").as("max_len"))
    val elems = df
      .select(explode(col(arrCol)).as("v"))
      .select(col("v").cast("double").as("v"))
      .agg(
        count(col("v")).as("elem_n"),
        sig5(avg("v")).as("elem_mean"),
        min("v").as("elem_min"),
        max("v").as("elem_max"),
        sig5(stddev_samp(col("v"))).as("elem_std"))
    lens.crossJoin(elems)
  }
}
