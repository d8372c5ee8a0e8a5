package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Inclusion, Sampling}

/** Dev utility: the round-8/9 scale claims MEASURED — (a) the
  * hash-threshold stratified sampler vs the windowed form on a
  * 90/10-skewed corpus (the window form serializes the dominant
  * stratum through ONE sort task; the hash form pays a histogram
  * aggregation and ranks only the boundary bucket), and (b) the
  * BottomK inclusion sketch vs the exact distinct-set join at
  * high key cardinality (the sketch's shuffle is O(k) per side
  * regardless of cardinality). Usage:
  * `graft.SamplingScaleSmoke [rows] [phases] [buckets]` — defaults
  * 10M, `sampling,inclusion` (phases CSV), 10000.
  *
  * `buckets` sizing (the knob the smoke exposes): the histogram is
  * strata × buckets rows and the sorted residual is
  * ~biggest-stratum / buckets rows — pick buckets ≪ stratum size so
  * the map-side combine collapses the histogram, and large enough
  * that the residual slice sorts in one task comfortably. The
  * library default (10⁶) is sized for corpus-scale strata (10⁹⁺
  * rows each); at a 10⁷-row smoke it would make the histogram
  * corpus-sized — measured 13.6 s vs 9.5 s at buckets = 10⁴. */
object SamplingScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val phases = (if (args.length > 1) args(1) else "sampling,inclusion")
      .split(",").toSet
    val buckets = if (args.length > 2) args(2).toInt else 10000
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
      println(f"[sampling-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    if (phases("sampling")) {
      // 90/10 skew: stratum "big" holds 90% of the corpus — the exact
      // adversarial shape the window form cannot survive at scale
      val big = (n * 9) / 10
      val df = spark.range(n).select(col("id"),
          when(col("id") < big, lit("big"))
            .otherwise(concat(lit("s"), pmod(col("id"), lit(10L))))
            .as("lang"))
        .transform(graft.ops.Materialize.materialize)
      val hashed = timed(s"stratifiedHashExact 10% of $n rows " +
          s"(90% skew, buckets=$buckets)") {
        Sampling.stratifiedHashExact(df, "lang", "id", 0.1, buckets)
          .count()
      }
      val windowed = timed("stratifiedExact (windowed) same corpus") {
        Sampling.stratifiedExact(df, "lang", "id", 0.1).count()
      }
      println(s"[sampling-smoke] kept: hash=$hashed windowed=$windowed " +
        s"(quotas equal: ${hashed == windowed})")
    }

    if (phases("inclusion")) {
      // high-cardinality FK check: every child key distinct (worst
      // case for the exact path's distinct-set shuffle), parent = the
      // even keys — true containment 0.5
      val child = spark.range(n).select(col("id").as("ck"))
        .transform(graft.ops.Materialize.materialize)
      val parent = spark.range(n).select((col("id") * 2L).as("pk"))
        .transform(graft.ops.Materialize.materialize)
      val exact = timed(s"inclusionStats exact ($n distinct child keys)") {
        Inclusion.inclusionStats(
          Seq(("child.ck->parent.pk", child, "ck", parent, "pk")))
          .collect()(0)
      }
      val sk = timed("inclusionSketchEstimate (k=1024 BottomK, no exact join)") {
        Inclusion.inclusionSketchEstimate(
          Seq(("child.ck->parent.pk", child, "ck", parent, "pk")))
          .collect()(0)
      }
      val exactInc = exact.getDouble(exact.fieldIndex("inclusion"))
      val estInc = sk.getDouble(sk.fieldIndex("inclusion_est"))
      println(f"[sampling-smoke] inclusion exact=$exactInc%.4f " +
        f"sketch=$estInc%.4f abs_err=${math.abs(estInc - exactInc)}%.4f")
    }
    spark.stop()
  }
}
