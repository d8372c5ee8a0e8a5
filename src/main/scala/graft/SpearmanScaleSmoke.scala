package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.profiler.Stats

/** Dev utility: exact-vs-approx Spearman at corpus scale.
  *
  * The exact form pays one single-partition sort window per column
  * (the correctness premise of average ranks); the grid-rank approx
  * is map-only. This smoke measures both walls at `rows` and the
  * per-pair |approx − exact| spread — the operating numbers for the
  * "which form do I run" decision in BASELINE.md.
  *
  * Usage: `graft.SpearmanScaleSmoke [rows]` (default 10M). */
object SpearmanScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[spearman-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // monotone pair (x, cube), reversal, and a hash-scrambled
    // independent column — written to parquet so both forms pay a
    // real scan
    val path = "/tmp/graft_spearman_smoke"
    timed(s"generate + write $n rows") {
      spark.range(n).select(
          col("id").cast("double").as("x"),
          pow(col("id").cast("double") / 1000.0, 3.0).as("cube"),
          (lit(0.0) - col("id").cast("double")).as("neg"),
          pmod(col("id") * 2654435761L, lit(1000000L)).cast("double")
            .as("noise"))
        .write.mode("overwrite").parquet(path)
    }
    val df = spark.read.parquet(path)
    val cols = Seq("x", "cube", "neg", "noise")
    val approx = timed("spearmanApprox (map-only grid ranks)") {
      Stats.spearmanApprox(df, cols).collect()
    }
    val exact = timed("spearmanMatrix (k single-partition windows)") {
      Stats.spearmanMatrix(df, cols).collect()
    }
    val e = exact.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(2)).toMap
    approx.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      println(f"[spearman-smoke] $k exact=${e(k)}%.5f " +
        f"approx=${r.getDouble(2)}%.5f " +
        f"|d|=${math.abs(e(k) - r.getDouble(2))}%.5f")
    }
    spark.stop()
  }
}
