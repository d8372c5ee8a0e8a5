package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Similarity}

/** Dev utility: the nprobe/recall operating-point frontier of the
  * IVF family (seeded vs Lloyd-trained coarse quantizer) and the
  * persisted ANN-index lifecycle timings (build / append / probe) at
  * scale — the table a user sizes an index with. Usage:
  * `graft.AnnIndexSmoke [vectors] [dim] [queries] [cells] [batch]
  * [amp] [clusters]` (defaults 2M / 32 / 50 / 64 / 100k / 0.15 /
  * 200). Corpus shape = AnnScaleSmoke (closed-form clustered; true
  * neighbors overwhelmingly same-cluster). At the default 0.15
  * perturbation the cluster structure SATURATES the frontier
  * (recall 1.000 at nprobe=1 — measured r10); raise `amp` to spread
  * same-cluster neighbors across cell boundaries and expose the
  * recall-vs-nprobe trade a production corpus shows.
  *
  * Reads at 100 TB: the IVF-flat rows time ONE query batch INCLUDING
  * the per-call codebook derivation (the honest one-shot cost); the
  * lifecycle rows separate the amortizable build from the per-batch
  * probe — the deployed split. Recall@10 is against the brute-force
  * exact top-k of the same batch. */
object AnnIndexSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val dim = if (args.length > 1) args(1).toInt else 32
    val q = if (args.length > 2) args(2).toInt else 50
    val cells = if (args.length > 3) args(3).toLong else 64L
    val batch = if (args.length > 4) args(4).toLong else 100000L
    val amp = if (args.length > 5) args(5).toDouble else 0.15
    val clusters = if (args.length > 6) args(6).toLong else 200L
    val k = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("vec_id"),
        array((0 until dim).map { d =>
          sin((col("id") % clusters) * (d + 1.0)) +
            lit(amp) * sin(col("id") * (d + 3.0))
        }: _*).as("embedding"))
    val emb = graft.ops.Materialize.materialize(corpus(0L, n))

    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ann-index-smoke] $name: $s%.1f s")
      (r, s)
    }
    def grab(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"),
          col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val (truth, _) = timed(s"brute force ($n x $q)") {
      grab(Similarity.cosineTopK(emb, "vec_id", "embedding",
        numQueries = q, k = k))
    }
    def recall(a: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0
      else a.intersect(truth).size.toDouble / truth.size

    // ---- IVF-flat frontier: seeded vs trained × nprobe sweep ----
    for (iters <- Seq(1, 2); nprobe <- Seq(1, 2, 4, 8, 16)) {
      val label = if (iters <= 1) "seeded" else "trained"
      val (res, s) = timed(s"ivf-flat $label nprobe=$nprobe") {
        grab(Similarity.ivfTopK(emb, "vec_id", "embedding",
          numQueries = q, k = k, centroidLo = q.toLong,
          centroidHi = q.toLong + cells, nprobe = nprobe, dim = dim,
          iters = iters))
      }
      println(f"[frontier] ivf_flat coarse=$label nprobe=$nprobe " +
        f"recall@10=${recall(res)}%.3f wall=$s%.1f s")
    }

    // ---- persisted IVF-PQ lifecycle: build / probe sweep / append --
    val pqK = 64L
    val path = java.nio.file.Files
      .createTempDirectory("graft_annidx_smoke").toString
    val (_, buildS) = timed(s"writeAnnIndex build " +
        s"($cells cells, m=8, k=$pqK, trained)") {
      AnnIndex.writeAnnIndex(emb, "vec_id", "embedding", path,
        ivfLo = q.toLong, ivfHi = q.toLong + cells,
        pqLo = q.toLong + cells, pqHi = q.toLong + cells + pqK,
        dim = dim, m = 8, iters = 2, coarseIters = 2)
    }
    val queries = emb.where(col("vec_id") < q)
    for (nprobe <- Seq(1, 2, 4, 8, 16)) {
      val (res, s) = timed(s"probeAnnIndex nprobe=$nprobe") {
        grab(AnnIndex.probeAnnIndex(spark, path, queries,
          "vec_id", "embedding", k = k, nprobe = nprobe))
      }
      println(f"[frontier] ivf_pq_index nprobe=$nprobe " +
        f"recall@10=${recall(res)}%.3f wall=$s%.1f s")
    }
    val batchDf = graft.ops.Materialize.materialize(
      corpus(n, n + batch))
    val (_, appendS) = timed(s"appendAnnIndex ($batch rows)") {
      AnnIndex.appendAnnIndex(batchDf, "vec_id", "embedding", path,
        dim = dim, m = 8)
    }
    val (_, probeS) = timed("probeAnnIndex post-append nprobe=4") {
      AnnIndex.probeAnnIndex(spark, path, queries,
        "vec_id", "embedding", k = k, nprobe = 4).collect()
    }
    println(f"[ann-index-smoke] lifecycle: build=$buildS%.1f s " +
      f"append($batch)=$appendS%.1f s probe=$probeS%.1f s")
    spark.stop()
  }
}
