package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Similarity, VectorQuant}

/** Dev utility: measured brute-force vs IVF vs hyperplane-LSH ANN
  * over a GENERATED clustered vector corpus — the wall-time/recall
  * trade the unit tests only assert structurally. Usage:
  * `graft.AnnScaleSmoke [vectors] [dim] [queries] [cells] [nprobe]`
  * (defaults 2M / 32 / 50 / 64 / 4 — the brute-force ground truth
  * is the expensive phase at N·Q exact scores, so Q stays small;
  * recall estimates stabilize well below 50·k judged pairs).
  *
  * Corpus shape (closed-form, no RNG at runtime): vector i belongs to
  * latent cluster c = i mod 200 and is that cluster's direction
  * sin(c·(d+1)) plus a 0.15-amplitude per-vector perturbation — so
  * true nearest neighbors are overwhelmingly same-cluster and a
  * cell-pruned index CAN be accurate, as with real embedding data.
  *
  * What the numbers mean at 100 TB: brute force costs N·Q dot
  * products per query batch; IVF costs N·C once per INDEX build
  * (amortized over every later batch) plus N·(nprobe/C)·Q per batch;
  * LSH costs N·bits once plus the colliding fraction. The smoke
  * runs one batch of Q queries so the printed IVF time INCLUDES its
  * index build — the per-batch advantage grows with reuse. Recall is
  * measured against the brute-force top-k ground truth. */
object AnnScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val dim = if (args.length > 1) args(1).toInt else 32
    val q = if (args.length > 2) args(2).toInt else 50
    val cells = if (args.length > 3) args(3).toLong else 64L
    val nprobe = if (args.length > 4) args(4).toInt else 4
    val k = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map { d =>
        sin((col("id") % 200L) * (d + 1.0)) +
          lit(0.15) * sin(col("id") * (d + 3.0))
      }: _*).as("embedding"))
      .transform(graft.ops.Materialize.materialize)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def grab(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"),
          col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = timed(s"brute force ($n vectors x $q queries)") {
      grab(Similarity.cosineTopK(emb, "vec_id", "embedding",
        numQueries = q, k = k))
    }
    val ivf = timed(s"IVF build+probe ($cells cells, nprobe=$nprobe)") {
      grab(Similarity.ivfTopK(emb, "vec_id", "embedding",
        numQueries = q, k = k, centroidLo = q.toLong,
        centroidHi = q.toLong + cells, nprobe = nprobe, dim = dim))
    }
    val lsh = timed("LSH build+probe (10-bit multiprobe)") {
      grab(Similarity.annTopK(emb, "vec_id", "embedding",
        numQueries = q, k = k, bits = 10, dim = dim))
    }
    // PQ family: distance ranking (ADC), not cosine — agreement with
    // the cosine ground truth is structural on this corpus (cluster
    // directions dominate), so the recall line is still meaningful
    val pqK = 16L
    val adc = timed(s"PQ ADC encode+scan (m=8, k=$pqK seeded)") {
      grab(VectorQuant.pqAdcTopK(emb, "vec_id", "embedding",
        seedLo = q.toLong + cells, seedHi = q.toLong + cells + pqK,
        numQueries = q, k = k, dim = dim, m = 8))
    }
    val ivfpq = timed(s"IVF-PQ ($cells cells, nprobe=$nprobe, m=8)") {
      grab(VectorQuant.ivfPqTopK(emb, "vec_id", "embedding",
        ivfLo = q.toLong, ivfHi = q.toLong + cells,
        pqLo = q.toLong + cells, pqHi = q.toLong + cells + pqK,
        numQueries = q, k = k, nprobe = nprobe, dim = dim, m = 8))
    }
    // LEARNED codebooks: k=256 sub-centroids per subspace, Lloyd-
    // trained (2 recompute rounds over the full corpus here; at
    // 100 TB you train on a bounded sample and freeze) — the
    // resolution jump that takes PQ from cluster-level to
    // within-cluster ranking on this corpus
    val pqKT = 256L
    val adcT = timed(s"PQ ADC trained (m=8, k=$pqKT, 2 Lloyd rounds)") {
      grab(VectorQuant.pqAdcTopK(emb, "vec_id", "embedding",
        seedLo = q.toLong + cells, seedHi = q.toLong + cells + pqKT,
        numQueries = q, k = k, dim = dim, m = 8, iters = 3))
    }
    val ivfpqT = timed(s"IVF-PQ trained ($cells cells, k=$pqKT)") {
      grab(VectorQuant.ivfPqTopK(emb, "vec_id", "embedding",
        ivfLo = q.toLong, ivfHi = q.toLong + cells,
        pqLo = q.toLong + cells, pqHi = q.toLong + cells + pqKT,
        numQueries = q, k = k, nprobe = nprobe, dim = dim, m = 8,
        iters = 3))
    }
    def recall(approx: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0
      else approx.intersect(truth).size.toDouble / truth.size
    // PQ resolution note: 16 seeded sub-centroids over 200 latent
    // clusters quantize to CLUSTER resolution — same-cluster vectors
    // share codes, so within-cluster order is tie-broken by id and
    // pair-level recall vs the exact ranking is near-random. The
    // structure PQ preserves at this codebook size is the cluster:
    // report the fraction of returned neighbors in the query's true
    // latent cluster (i ≡ q mod 200) alongside pair recall.
    def clusterRecall(approx: Set[(Long, Long)]): Double =
      if (approx.isEmpty) 0.0
      else approx.count { case (q2, v) => v % 200L == q2 % 200L }
        .toDouble / approx.size
    println(f"[ann-smoke] truth pairs=${truth.size} " +
      f"ivf_recall=${recall(ivf)}%.3f lsh_recall=${recall(lsh)}%.3f " +
      f"adc_recall=${recall(adc)}%.3f ivfpq_recall=${recall(ivfpq)}%.3f " +
      f"adc_trained_recall=${recall(adcT)}%.3f " +
      f"ivfpq_trained_recall=${recall(ivfpqT)}%.3f")
    println(f"[ann-smoke] cluster recall: brute=${clusterRecall(truth)}%.3f " +
      f"ivf=${clusterRecall(ivf)}%.3f lsh=${clusterRecall(lsh)}%.3f " +
      f"adc=${clusterRecall(adc)}%.3f ivfpq=${clusterRecall(ivfpq)}%.3f " +
      f"adc_trained=${clusterRecall(adcT)}%.3f " +
      f"ivfpq_trained=${clusterRecall(ivfpqT)}%.3f")
    // exact re-rank of the trained index's ADC top-50: the two-stage
    // production form — the shortlist carries ADC's recall ceiling,
    // the exact pass fixes the head ORDER (pair recall vs the exact
    // cosine truth is the number that shows it)
    val rerankT = timed(s"IVF-PQ trained + exact rerank (topM=50)") {
      grab(VectorQuant.ivfPqRerankTopK(emb, "vec_id", "embedding",
        ivfLo = q.toLong, ivfHi = q.toLong + cells,
        pqLo = q.toLong + cells, pqHi = q.toLong + cells + pqKT,
        numQueries = q, k = k, topM = 50, nprobe = nprobe, dim = dim,
        m = 8, iters = 3))
    }
    println(f"[ann-smoke] rerank: pair=${recall(rerankT)}%.3f " +
      f"cluster=${clusterRecall(rerankT)}%.3f " +
      f"(vs ivfpq_trained pair=${recall(ivfpqT)}%.3f)")
    spark.stop()
  }
}
