package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.profiler.{Profiler, ProfilerConfig}

/** Dev utility: profile a generated 10M-row, 8-column table with the
  * scale configuration (HLL distinct, approx percentiles) to observe
  * throughput beyond the parquet fixtures — the fixed-pass plans must
  * scale linearly with rows. Usage: graft.ScaleSmoke [rows] */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(rows).select(
      col("id"),
      (col("id") % 1000).cast("double").as("bucketed"),
      (col("id") * 1234567L % 999983L).cast("double").as("pseudo"),
      sin(col("id").cast("double")).as("wave"),
      when(col("id") % 7 === 0, lit(null).cast("double"))
        .otherwise(rand(42)).as("noisy"),
      (col("id") % 5).cast("string").as("cat5"),
      when(col("id") % 3 === 0, "x").otherwise("y").as("cat2"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000L)
        .as("ts"))
    df.cache().count() // exclude generation from the measurement
    val t0 = System.nanoTime()
    val p = Profiler.profile(df, ProfilerConfig(
      exactDistinct = false, exactQuantiles = false))
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[scale-smoke] profiled $rows%,d rows x ${p.nvar} cols " +
      f"in $secs%.1f s (${rows / secs / 1e6}%.1f M rows/s)")
    val t1 = System.nanoTime()
    val pf = Profiler.profileFused(df)
    val fsecs = (System.nanoTime() - t1) / 1e9
    println(f"[scale-smoke] FUSED  $rows%,d rows x ${pf.nvar} cols " +
      f"in $fsecs%.1f s (${rows / fsecs / 1e6}%.1f M rows/s)")
    p.columns.foreach(c => println(
      s"  ${c.name}: kind=${c.kind} distinct~${c.distinct} " +
        s"mean=${c.stats.get("mean").map(_.toString).getOrElse("-")}"))
    spark.stop()
  }
}
