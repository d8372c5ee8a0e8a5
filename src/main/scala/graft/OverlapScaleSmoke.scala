package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Corpus, Privacy}

/** Dev utility: the session-5 scale claims MEASURED — (a) exact vs
  * KMV-sketched cross-source overlap on a corpus with KNOWN
  * pairwise Jaccard (overlapping content windows: source s covers
  * contents [s·T, s·T + W), so adjacent sources share J =
  * (W−T)/(W+T) exactly), (b) the reproducible shuffle's bounded
  * per-shard sort at 100M rows, (c) the privacy risk curve's single
  * shuffle at 100M rows over ~1M QI groups. Usage:
  * `graft.OverlapScaleSmoke [docs] [sources] [phases]` — defaults
  * 2M, 50, `overlap,shuffle,privacy`. */
object OverlapScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val s = if (args.length > 1) args(1).toInt else 50
    val phases = (if (args.length > 2) args(2)
      else "overlap,shuffle,privacy").split(",").toSet
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
      println(f"[overlap-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    if (phases("overlap")) {
      // source sid covers contents [sid·T, sid·T + W): adjacent
      // Jaccard (W−T)/(W+T) ≈ 0.1429, non-adjacent 0
      val W = 40000L; val T = 30000L
      val docs = spark.range(n).select(
          (col("id") % s).as("sid"),
          // `div`, not `/`: Divide on longs is double division and a
          // fractional content id would make every doc unique
          expr(s"(id % $s) * $T + ((id div $s) % $W)").as("c"))
        .select(concat(lit("s"), col("sid")).as("source"),
          concat(lit("x"), col("c"), lit(" y"), col("c"),
            lit(" z"), col("c"), lit(" w"), col("c")).as("text"))
        .transform(graft.ops.Materialize.materialize)
      val exact = timed(s"exact sourceOverlap ($n docs, $s sources)") {
        Corpus.sourceOverlap(docs, "source", "text").collect()
      }
      val est = timed("sourceOverlapSketch k=256") {
        Corpus.sourceOverlapSketch(docs, "source", "text", k = 256)
          .collect()
      }
      val exactJ = exact.map(r =>
        ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
      val errs = est.map(r => math.abs(r.getDouble(4) -
        exactJ((r.getString(0), r.getString(1)))))
      val adj = exact.filter(r => r.getDouble(5) > 0)
      println(f"[overlap-smoke] theoretical adjacent J = " +
        f"${(W - T).toDouble / (W + T)}%.4f; measured adjacent " +
        f"pairs = ${adj.length}; mean adjacent exact J = " +
        f"${adj.map(_.getDouble(5)).sum / math.max(adj.length, 1)}%.4f")
      println(f"[overlap-smoke] sketch abs err: mean " +
        f"${errs.sum / errs.length}%.5f  max ${errs.max}%.5f " +
        f"over ${errs.length} pairs")
    }

    if (phases("shuffle")) {
      val m = 100000000L
      val df = spark.range(m).toDF("id")
      val cnt = timed(s"reproducibleShuffle $m rows, 2000 shards") {
        Corpus.reproducibleShuffle(df, "id", shards = 2000)
          .groupBy("shard").agg(max("pos").as("mx")).count()
      }
      println(s"[overlap-smoke] shuffle shards materialized: $cnt")
    }

    if (phases("kendall")) {
      // 100M correlated pairs: y = x + uniform noise via MINSTD
      val m = 100000000L
      val df = spark.range(m).select(
        (col("id") % 100000L).cast("double").as("x"),
        ((col("id") % 100000L) +
          graft.ops.Sampling.minstdMille(col("id")) * 50L)
          .cast("double").as("y"))
      val r = timed(s"kendallGrid $m rows (20x20 grid)") {
        graft.profiler.Stats.kendallGrid(df, Seq(("x", "y"))).head()
      }
      println(s"[overlap-smoke] tau_b = ${r.getDouble(5)} over n=" +
        s"${r.getLong(2)}")
    }

    if (phases("entropy")) {
      // 100M docs of 4 tokens each (~400M tokens), Zipf-ish ids
      val m = 100000000L
      val df = spark.range(m).select(
        concat(lit("w"), pmod(col("id") * col("id"), lit(50000L)),
          lit(" v"), pmod(col("id"), lit(997L)),
          lit(" u"), pmod(col("id"), lit(31L)),
          lit(" t"), pmod(col("id"), lit(7L))).as("text"))
      val e = timed(s"ngramEntropy $m docs (~${4 * m} tokens)") {
        graft.ops.TextStats.ngramEntropy(df, "text").collect()
      }
      e.foreach(r => println(s"[overlap-smoke] n=${r.getLong(0)} " +
        s"H=${r.getDouble(3)} bits over ${r.getLong(1)} grams"))
    }

    if (phases("gini")) {
      // 10M heavy-tailed values: x = (id % 1000)³ — strong inequality
      val m = 10000000L
      val df = spark.range(m).select(
        (pmod(col("id"), lit(1000L)) * pmod(col("id"), lit(1000L)) *
          pmod(col("id"), lit(1000L))).cast("double").as("x"))
        .transform(graft.ops.Materialize.materialize)
      val exact = timed(s"gini EXACT (rank window) $m rows") {
        graft.profiler.Stats.gini(df, Seq("x")).head().getDouble(2)
      }
      val approx = timed("giniApprox (map-only, B=100)") {
        graft.profiler.Stats.giniApprox(df, Seq("x")).head()
          .getDouble(1)
      }
      println(f"[overlap-smoke] gini exact=$exact%.5f approx=" +
        f"$approx%.5f  |err|=${math.abs(exact - approx)}%.5f")
    }

    if (phases("kanon")) {
      val m = 100000000L
      val df = spark.range(m).select(col("id"),
        (col("id") % 1000000L).as("qa"),
        when(col("id") % 97 === 0, col("id")).otherwise(0L).as("qb"))
      val kept = timed(s"kAnonymize $m rows at k=10") {
        Privacy.kAnonymize(df, Seq("qa", "qb"), 10L).count()
      }
      println(s"[overlap-smoke] kept $kept of $m rows")
    }

    if (phases("privacy")) {
      val m = 100000000L
      // ~1M QI groups of ~100 rows with a long singleton tail
      val df = spark.range(m).select(
        (col("id") % 1000000L).as("qa"),
        when(col("id") % 97 === 0, col("id")).otherwise(0L).as("qb"))
      val curve = timed(s"riskCurve $m rows, ~2M QI groups") {
        Privacy.riskCurve(df, Seq("qa", "qb"), Seq(2L, 10L, 100L))
          .collect()
      }
      curve.foreach(r => println(s"[overlap-smoke] k=${r.getLong(0)} " +
        s"groups_at_risk=${r.getLong(1)} rows_at_risk=${r.getLong(2)}"))
    }
    spark.stop()
  }
}
