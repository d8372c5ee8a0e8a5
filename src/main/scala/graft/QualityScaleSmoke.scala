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
        // suggestion at corpus scale: the approx form's single
        // no-Expand scan vs the exact multi-distinct
        val sCols = Seq("source", "score", "user", "bucket")
        val ap = timed("suggest with HLL cardinalities (4 cols)") {
          Quality.suggest(df, sCols, approxUnique = true).collect()
        }
        println(ap.map(r =>
          s"  ${r.getString(0)}:${r.getString(1)}").mkString("\n"))
        timed("suggest with EXACT cardinalities (4 cols)") {
          Quality.suggest(df, sCols).collect()
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

    if (phases("wide")) {
      // WIDE embeddings (dim 256): the case the chunked covariance
      // and the JL reduction exist for. Three measurements:
      //  (a) full-dim anisotropy — 33k agg expressions through
      //      chunkedAggPar (the brute-force reference),
      //  (b) JL 256→32 then anisotropy in the reduced space — the
      //      production composition (covariance cost drops 64×),
      //  (c) ANN recall in the projected space vs full-dim exact
      //      top-10 — "is RP safe as the pre-LSH stage".
      val dim = 256; val outDim = 32; val nw = math.min(vecs, 500000L)
      val wcols = array((0 until dim).map(d =>
        (sin(col("id") * (0.11 + d * 0.007)) +
          when(lit(d % 16) === 0,
            sin(col("id") * 0.0017) * 3.0).otherwise(lit(0.0)))
          .cast("float")): _*)
      val wdf = spark.range(nw)
        .select(col("id").as("vec_id"), wcols.as("embedding"))
        .transform(graft.ops.Materialize.materialize)
      wdf.count()

      val full = timed(s"anisotropy FULL dim $dim at $nw vecs " +
          "(33k-expression chunked covariance)") {
        EmbedEval.anisotropy(wdf, "embedding", dim, iters = 4,
          chunk = 1024).collect()
      }
      println("  full: " + full.mkString)

      val proj = timed(s"JL $dim->$outDim projection encode at $nw") {
        val p = graft.ops.Projection
          .randomProject(wdf, "vec_id", "embedding", dim, outDim)
          .groupBy("vec_id")
          .agg(sort_array(collect_list(struct(col("out_dim"),
            col("y")))).as("s"))
          .select(col("vec_id"),
            expr("transform(s, x -> cast(x.y as float))").as("embedding"))
        graft.ops.Materialize.materialize(p)
      }
      proj.count()
      val red = timed(s"anisotropy in the REDUCED $outDim-dim space") {
        EmbedEval.anisotropy(proj, "embedding", outDim, iters = 4)
          .collect()
      }
      println("  reduced: " + red.mkString)

      // recall: exact top-10 of 20 queries in full vs projected space
      val q = 20
      val topFull = timed(s"exact cosine top-10, $q queries, FULL dim") {
        graft.ops.Similarity.cosineTopK(wdf, "vec_id", "embedding",
          q, 10).collect()
          .groupBy(_.getLong(0))
          .map { case (k, v) => k -> v.map(_.getLong(2)).toSet }
      }
      val topProj = timed(s"exact cosine top-10, $q queries, " +
          s"PROJECTED dim $outDim") {
        graft.ops.Similarity.cosineTopK(proj, "vec_id", "embedding",
          q, 10).collect()
          .groupBy(_.getLong(0))
          .map { case (k, v) => k -> v.map(_.getLong(2)).toSet }
      }
      val rec = topFull.keys.map(k =>
        (topFull(k) & topProj.getOrElse(k, Set.empty)).size / 10.0)
      println(f"  RP recall@10 vs full-dim exact: " +
        f"${rec.sum / rec.size}%.3f over $q queries")
    }

    spark.stop()
  }
}
