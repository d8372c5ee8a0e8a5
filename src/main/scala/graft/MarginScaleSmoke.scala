package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev utility: margin-based bitext mining at corpus scale — the
  * measured case for [[graft.ops.Similarity.marginMineAnn]] (the
  * declared `embed_margin_mine_ann` scale form) where the dense
  * |X|·|Y| matrix is quadratic-infeasible. Usage:
  * `graft.MarginScaleSmoke [xN] [yN] [dim] [bits] [clusters]
  * [denseN]` (defaults 200k / 200k / 32 / 14 / 10000 / 20000).
  *
  * Corpus shape (closed-form, no runtime RNG): x-row i and y-row i
  * share latent cluster i mod `clusters` (the "translation pair"
  * structure bitext mining assumes — LSH buckets collide
  * within-cluster), plus per-vector perturbation. The smoke times
  * the ANN-pruned mining end-to-end, counts the scored candidate
  * pairs vs the dense |X|·|Y| count, and times the dense form at
  * `denseN`×`denseN` for the crossover reference. */
object MarginScaleSmoke {
  def main(args: Array[String]): Unit = {
    val xN = if (args.length > 0) args(0).toLong else 200000L
    val yN = if (args.length > 1) args(1).toLong else 200000L
    val dim = if (args.length > 2) args(2).toInt else 32
    val bits = if (args.length > 3) args(3).toInt else 14
    val clusters = if (args.length > 4) args(4).toLong else 10000L
    val denseN = if (args.length > 5) args(5).toLong else 20000L
    // thread count via SPARK_GRAFT_CPUS: the 270M-pair shuffle at
    // the default size spills heavily, and 32 concurrent spill
    // readers tripped a JDK FileChannel NativeThreadSet race
    // (ArrayIndexOutOfBoundsException in sun.nio) on this box —
    // fewer, larger tasks avoid it
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def side(n: Long, phase: Double): DataFrame =
      graft.ops.Materialize.materialize(
        spark.range(n).select(col("id").as("vec_id"),
          array((0 until dim).map { d =>
            sin((col("id") % clusters) * (d + 1.0)) +
              lit(0.15) * sin(col("id") * (d + 3.0) + lit(phase))
          }: _*).as("embedding")))
    val x = side(xN, 0.0)
    val y = side(yN, 1.0)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[margin-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // candidate volume: the count the bucket join actually scores
    val planes = Similarity.hyperplanes(bits, dim)
    val xb = x.select(col("vec_id").as("xid"),
      Similarity.lshBucket(col("embedding"), planes).as("xb"))
    val yb = y.select(col("vec_id").as("yid"),
      Similarity.lshBucket(col("embedding"), planes).as("yb"))
    val xp = xb.select(col("xid"),
      explode(array(col("xb") +: (0 until bits).map(j =>
        col("xb").bitwiseXOR(lit(1L << j))): _*)).as("probe"))
    val cand = timed("candidate count (bucket join)") {
      yb.join(xp, col("yb") === col("probe")).count()
    }
    println(f"[margin-smoke] candidates=$cand dense=${xN * yN} " +
      f"reduction=${xN * yN / math.max(cand, 1L)}x")

    val top = timed(s"marginMineAnn ($xN x $yN, $bits bits)") {
      Similarity.marginMineAnn(x, y, "vec_id", "embedding",
        dim = dim, bits = bits, k = 4, topM = 100).collect()
    }
    // the translation-pair structure: how many mined top pairs are
    // same-cluster (the planted signal)
    val sameCluster = top.count(r =>
      r.getLong(1) % clusters == r.getLong(2) % clusters)
    println(s"[margin-smoke] top pairs=${top.length} " +
      s"same_cluster=$sameCluster")

    if (denseN > 0) {
      val xd = side(denseN, 0.0)
      val yd = side(denseN, 1.0)
      timed(s"dense marginMine reference ($denseN x $denseN)") {
        Similarity.marginMine(xd, yd, "vec_id", "embedding",
          dim = dim, k = 4, topM = 100).collect()
      }
      timed(s"marginMineAnn at the same size ($denseN x $denseN)") {
        Similarity.marginMineAnn(xd, yd, "vec_id", "embedding",
          dim = dim, bits = bits, k = 4, topM = 100).collect()
      }
    }
    spark.stop()
  }
}
