package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{EmbedEval, Quality}
import graft.ops.Quality._

/** Dev utility: scale measurements for the round-10 quality and
  * embedding-health families.
  *
  * Phases (CSV arg 2):
  *  - `quality`: an 8-check suite over a generated wide table at
  *    `rows` (default 100M) — the FUSED single-scan evaluation vs
  *    the naive one-job-per-check loop (what a user without the
  *    compiled suite would run), plus the exact-uniqueness vs
  *    HLL-uniqueness gap at cardinality (exact count(DISTINCT)
  *    forces an Expand + full-width shuffle; HLL keeps the suite
  *    one mergeable pass).
  *  - `embed`: dimProfile and anisotropy at `vecs` (default 2M)
  *    32-dim vectors — the explode-partial-agg shuffle stays O(dim)
  *    groups and the covariance scan stays one row regardless of N.
  *
  * Usage: `graft.QualityScaleSmoke [rows] [phases] [vecs]`.
  * Numbers recorded in BASELINE.md round-10. */
object QualityScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val phases = (if (args.length > 1) args(1) else "quality,embed")
      .split(",").toSet
    val vecs = if (args.length > 2) args(2).toLong else 2000000L
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
      println(f"[quality-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    if (phases("quality")) {
      // wide-ish corpus row: a category, a bounded metric with an
      // injected violation band, a nullable field, a high-card key
      // parquet round-trip so every job pays a REAL columnar scan
      // (a Materialized/cached input hides exactly the cost the
      // fused suite saves: N-checks-in-one-scan vs N scans)
      val path = "/tmp/graft_quality_smoke"
      timed(s"generate + write $n-row parquet") {
        spark.range(n).select(col("id"),
            concat(lit("src"), pmod(col("id"), lit(20L))).as("source"),
            (pmod(col("id") * 2654435761L, lit(1000L)).cast("double")
              / 10.0).as("score"),
            when(pmod(col("id"), lit(100L)) === 0L,
                lit(null).cast("string"))
              .otherwise(concat(lit("u"), col("id"))).as("user"),
            pmod(col("id") * 40503L, lit(977L)).as("bucket"))
          .write.mode("overwrite").parquet(path)
      }
      val df = spark.read.parquet(path)
      df.count() // warm codegen + file listing

      val noUniq = Seq(
        Completeness("user", 0.995),
        Completeness("score", 1.0),
        InRange("score", 0.0, 95.0, 0.9),
        InSet("source", (0 until 20).map(i => s"src$i"), 1.0),
        Matches("user", "^u[0-9]+$", 0.99),
        MeanBetween("score", 40.0, 60.0),
        RowCountBetween(1L, Long.MaxValue / 2))
      val suite = noUniq :+ Uniqueness("bucket", 0.000001)

      val fused = timed(s"fused suite (${noUniq.size} checks, one " +
          s"scan), $n rows") {
        Quality.runChecks(df, noUniq).collect()
      }
      println(fused.map(r =>
        s"  ${r.getString(0)}(${r.getString(1)})=" +
          f"${r.getDouble(2)}%.4f pass=${r.getLong(5)}").mkString("\n"))

      timed(s"naive per-check loop (${noUniq.size} jobs, one scan " +
          "each)") {
        noUniq.foreach(c => Quality.runChecks(df, Seq(c)).collect())
      }

      timed(s"fused suite + HLL uniqueness, $n rows") {
        Quality.runChecks(df, suite, approxUnique = true).collect()
      }

      timed(s"fused suite + EXACT uniqueness, $n rows") {
        Quality.runChecks(df, suite).collect()
      }

      timed(s"per-group suite over 20 sources, $n rows") {
        Quality.runChecksByGroup(df, Seq("source"), noUniq,
          approxUnique = true).collect()
      }

      if (phases("uniq")) {
        // uniqueness at TRUE cardinality (~99M distinct strings):
        // exact count(DISTINCT) must shuffle every distinct value;
        // HLL ships one 2.5 KB sketch per partition
        val u = Seq(Uniqueness("user", 0.9))
        timed(s"HLL uniqueness on ~${n / 1000000}M-distinct user col") {
          Quality.runChecks(df, u, approxUnique = true).collect()
        }
        timed("EXACT uniqueness on the same column") {
          Quality.runChecks(df, u).collect()
        }
      }
    }

    if (phases("embed")) {
      val dim = 32
      val vcols = array((0 until dim).map(d =>
        (sin(col("id") * (0.37 + d * 0.011)) +
          when(lit(d) === 0, sin(col("id") * 0.0013) * 4.0)
            .otherwise(lit(0.0))).cast("float")): _*)
      val vdf = spark.range(vecs)
        .select(col("id").as("vec_id"), vcols.as("embedding"))
        .transform(graft.ops.Materialize.materialize)
      vdf.count()

      timed(s"dimProfile $vecs x $dim") {
        EmbedEval.dimProfile(vdf, "vec_id", "embedding", dim).collect()
      }
      val a = timed(s"anisotropy $vecs x $dim (cov + 4 power iters)") {
        EmbedEval.anisotropy(vdf, "embedding", dim, iters = 4).collect()
      }
      println("  " + a.mkString)
    }

    spark.stop()
  }
}
