package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.profiler.Stats

/** Dev utility: [[graft.profiler.Stats.groupedQuantilesRouted]] at
  * HIGH group cardinality — the regime the r14 CASE-literal premise
  * could not survive (it compiled groups × cols × 5 literals into
  * one driver-side expression tree; the r15 form joins the per-group
  * premise frame back on the group key, so driver state is O(1)).
  *
  * Generates `rows` rows over `groups` distinct keys (hash-scattered
  * so groups interleave across partitions — the per-user/per-domain
  * shape), writes parquet so the run pays a real scan, then times
  * the routed grouped quantiles over two value columns and reports
  * the contract verdict (every emitted row must be within_bound).
  *
  * Usage: `graft.GroupedScaleSmoke [rows] [groups]`
  * (default 10M rows, 1M groups → ~10 values per group). */
object GroupedScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val groups = if (args.length > 1) args(1).toLong else 1000000L
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
      println(f"[grouped-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val path = "/tmp/graft_grouped_smoke"
    timed(s"generate + write $n rows / $groups groups") {
      spark.range(n).select(
          pmod(col("id") * 2654435761L, lit(groups)).as("grp_key"),
          (col("id") % 9973L).cast("double").as("v1"),
          pmod(col("id") * 40503L, lit(100000L)).cast("double").as("v2"))
        .write.mode("overwrite").parquet(path)
    }
    val df = spark.read.parquet(path)
    timed(s"groupedQuantilesRouted over $groups groups x 2 cols") {
      val out = Stats.groupedQuantilesRouted(df, "grp_key",
        Seq("v1", "v2"))
      val r = out.agg(count(lit(1)).as("rows"),
        coalesce(sum(when(!col("within_bound"), 1L)), lit(0L))
          .as("bad")).first()
      println(s"[grouped-smoke] contract rows=${r.getLong(0)} " +
        s"violations=${r.getLong(1)}")
    }
    spark.stop()
  }
}
