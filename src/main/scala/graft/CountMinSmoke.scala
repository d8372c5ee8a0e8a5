package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.CatStats

/** Dev utility: Count–Min at stream scale — measures the claims:
  * the sketch build costs ONE O(distinct) value-count shuffle (the
  * same shuffle exact counting pays) + an O(distinct·d) fold into
  * the O(d·w) counter frame; per-shard sketches merge counter-wise;
  * the error-contract table is an O(distinct) join against the tiny
  * counter frame.
  *
  * Data: `rows` rows with a Zipf-ish value drawn from ~`vocab`
  * distinct ids (deterministic multiplicative hashing, squared to
  * skew — the head value holds ~1% of the stream), 16 shards.
  *
  * Usage: `graft.CountMinSmoke [rows] [vocab]`. */
object CountMinSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000000L
    val vocab = if (args.length > 1) args(1).toLong else 100000L
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
      println(f"[cm-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val path = "/tmp/graft_cm_smoke"
    timed(s"generate + write $rows rows (~$vocab distinct, skewed)") {
      val h = pmod(col("id") * lit(2654435761L), lit(1048576L))
        .cast("double") / lit(1048576.0)
      spark.range(rows)
        .select(
          concat(lit("v"), (col("id") % 16L).cast("string")).as("shard"),
          concat(lit("k"),
            (col("id") % 16L), lit("_"),
            (pmod(col("id") * lit(2654435761L), lit(1048576L))
              .cast("double") / lit(1048576.0) *
              (h * vocab)).cast("long").cast("string")).as("v"))
        .write.mode("overwrite").parquet(path)
    }
    val df = spark.read.parquet(path)
    timed("countMinErr top-20 (exact + sketch + verdicts)") {
      CatStats.countMinErr(df, "v").collect()
        .take(3).foreach(r => println(s"[cm-smoke] $r"))
    }
    timed("countMinMergeCheck (16 shard sketches vs whole)") {
      val rws = CatStats.countMinMergeCheck(df, "v", "shard").collect()
      println(s"[cm-smoke] buckets = ${rws.length}, all equal = " +
        rws.forall(_.getBoolean(4)))
    }
    spark.stop()
  }
}
