package graft

import org.apache.spark.sql.DataFrame
import graft.ops.EmbedEval
import graft.det.Sig

/** Embedding-health operators: the per-dimension profile (dead dims,
  * zero fractions, the norm summary row) and the anisotropy power
  * iteration (checked against an independent driver-side eigen
  * estimate on the raw data). */
class EmbedHealthSpec extends SparkSpec {

  private def toDF(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("dimProfile: dead dimension, zero fractions and the norm row") {
    val dim = 4
    // dim0 varies; dim1 constant 5 (dead, nonzero); dim2 constant 0
    // (dead AND all-zero); dim3 half zeros; one all-zero row would
    // need dim1=0 — instead vec 9 is the zero vector in dims 0,2,3
    val rows = (0 until 10).map { i =>
      val v = Array(
        (i + 1).toFloat, 5.0f, 0.0f,
        if (i % 2 == 0) 0.0f else 2.0f)
      (i.toLong, v)
    }
    val out = EmbedEval.dimProfile(toDF(rows), "vec_id", "embedding",
      dim).collect()
    assert(out.length == dim + 1)
    val byDim = out.map(r => r.getLong(0) -> r).toMap
    // dim 0: alive, no zeros
    assert(byDim(0L).getAs[Long]("is_dead") == 0L)
    assert(byDim(0L).getAs[Double]("p_zero") == 0.0)
    assert(byDim(0L).getAs[Double]("min_val") == 1.0)
    assert(byDim(0L).getAs[Double]("max_val") == 10.0)
    // dim 1: constant nonzero → dead, p_zero 0
    assert(byDim(1L).getAs[Long]("is_dead") == 1L)
    assert(byDim(1L).getAs[Double]("p_zero") == 0.0)
    assert(byDim(1L).getAs[Double]("mean") == 5.0)
    // dim 2: constant zero → dead, p_zero 1
    assert(byDim(2L).getAs[Long]("is_dead") == 1L)
    assert(byDim(2L).getAs[Double]("p_zero") == 1.0)
    // dim 3: half zeros, alive
    assert(byDim(3L).getAs[Long]("is_dead") == 0L)
    assert(byDim(3L).getAs[Double]("p_zero") == 0.5)
    // norm row: every vector has norm > 0 here (dim1 = 5 always)
    val norm = byDim(-1L)
    assert(norm.getAs[Long]("n") == 10L)
    assert(norm.getAs[Double]("p_zero") == 0.0)
    assert(norm.getAs[Double]("min_val") > 5.0 - 1e-9)
  }

  test("dimProfile: zero-norm vectors are counted in the norm row") {
    val rows = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)))
    val out = EmbedEval.dimProfile(toDF(rows), "vec_id", "embedding", 2)
      .collect()
    val norm = out.find(_.getLong(0) == -1L).get
    assert(norm.getAs[Double]("p_zero") == 0.5)
    assert(norm.getAs[Double]("max_val") == 5.0)
    assert(norm.getAs[Double]("min_val") == 0.0)
  }

  test("dimProfile skips vectors of the wrong dimension") {
    val rows = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)), // wrong dim — excluded
      (2L, Array(5.0f, 6.0f)))
    val out = EmbedEval.dimProfile(toDF(rows), "vec_id", "embedding", 2)
      .collect()
    assert(out.find(_.getLong(0) == -1L).get.getAs[Long]("n") == 2L)
    assert(out.find(_.getLong(0) == 0L).get.getAs[Long]("n") == 2L)
  }

  test("anisotropy: matches an independent eigen estimate and its " +
      "invariants on a planted dominant direction") {
    val dim = 6
    val n = 200
    // planted: dim0 carries 10× the variance of the rest
    def gen(i: Int): Array[Float] = {
      def h(j: Int): Double =
        math.sin(i * 37.0 + j * 11.0) // deterministic pseudo-noise
      Array.tabulate(dim)(j =>
        (if (j == 0) 10.0 * h(0) else h(j)).toFloat)
    }
    val rows = (0 until n).map(i => (i.toLong, gen(i)))
    val out = EmbedEval.anisotropy(toDF(rows), "embedding", dim,
      iters = 4).collect()
    assert(out.length == 1)
    val r = out.head
    val trace = r.getAs[Double]("trace")
    val lambda = r.getAs[Double]("lambda1")
    val expl = r.getAs[Double]("explained")
    assert(r.getAs[Long]("n_vectors") == n.toLong)
    // invariants: avg-eigenvalue <= lambda1 <= trace
    assert(lambda <= trace + 1e-9)
    assert(lambda >= trace / dim - 1e-9)
    assert(expl > 0.0 && expl <= 1.0)
    // independent reconstruction: covariance from raw data, then a
    // LONG power iteration (50 rounds) — the 4-round declared result
    // must already be within 1% of the converged top eigenvalue on
    // this well-separated spectrum
    val data = rows.map(_._2.map(_.toDouble))
    val mu = Array.tabulate(dim)(j => data.map(_(j)).sum / n)
    val cov = Array.tabulate(dim, dim) { (a, b) =>
      data.map(v => v(a) * v(b)).sum / n - mu(a) * mu(b)
    }
    var v = Array.fill(dim)(1.0)
    for (_ <- 0 until 50) {
      val w = Array.tabulate(dim)(a =>
        (0 until dim).map(b => cov(a)(b) * v(b)).sum)
      val nn = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nn)
    }
    val lamRef = (0 until dim).map(a =>
      v(a) * (0 until dim).map(b => cov(a)(b) * v(b)).sum).sum
    assert(math.abs(lambda - lamRef) / lamRef < 0.01,
      s"power-iteration λ1 $lambda vs converged $lamRef")
    // the planted direction dominates: explained well above uniform
    assert(expl > 0.8, s"explained $expl should reflect 10x variance")
  }

  test("anisotropy survives a degenerate corpus (identical vectors) " +
      "with zeros instead of a crash") {
    val rows = (0 until 10).map(i =>
      (i.toLong, Array.fill(4)(2.5f)))
    val out = EmbedEval.anisotropy(toDF(rows), "embedding", 4,
      iters = 3).collect()
    val r = out.head
    assert(r.getAs[Double]("trace") == 0.0)
    assert(r.getAs[Double]("lambda1") == 0.0)
    assert(r.getAs[Double]("explained") == 0.0)
    assert(r.getAs[Long]("n_vectors") == 10L)
  }

  test("randomProject equals the driver-side matrix product; signs " +
      "are balanced") {
    import graft.ops.Projection
    val dim = 8; val k = 4
    val rows = (0 until 5).map(i =>
      (i.toLong, Array.tabulate(dim)(d => (i * dim + d + 1).toFloat)))
    val got = Projection.randomProject(toDF(rows), "vec_id",
        "embedding", dim, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val m = Projection.rpMatrix(dim, k)
    for ((id, v) <- rows; o <- 0 until k) {
      val want = Sig.sig5((0 until dim)
        .map(d => v(d).toDouble * m(o)(d)).sum)
      assert(got((id, o.toLong)) == want, s"vec $id out-dim $o")
    }
    // sign balance over the whole 64×16 declared matrix: an LCG
    // parity that collapsed to one sign would make the projection
    // a (scaled) sum — catch that class of bug
    val signs = for (d <- 0 until 64; o <- 0 until 16)
      yield Projection.rpSign(d, o, 16)
    val pos = signs.count(_ > 0)
    assert(pos > signs.size * 3 / 10 && pos < signs.size * 7 / 10,
      s"degenerate sign balance: $pos of ${signs.size}")
  }

  test("rpDistortion: near-isometry on spread data, zero-distance " +
      "pairs excluded, ratios positive") {
    import graft.ops.Projection
    val dim = 32; val k = 16
    val n = 24
    // spread pseudo-random vectors (no planted structure) — JL
    // expectation E[ratio] = 1. The i·d cross term matters: without
    // it every difference vector lives in the 2-dim {sin, cos}
    // subspace of one frequency and a FIXED matrix can contract it
    def gen(i: Int): Array[Float] = Array.tabulate(dim)(d =>
      math.sin((i * 1009.0 + d * 101.0 + i * d * 13.0) * 0.7).toFloat)
    val rows = (0 until n).map(i => (i.toLong, gen(i))) :+
      (n.toLong, gen(0)) // duplicate of vec 0
    val out = Projection.rpDistortion(toDF(rows), "vec_id",
      "embedding", dim, k, sampleIds = n + 1L, eps = 0.5).collect()
    assert(out.length == 1)
    val r = out.head
    // C(25,2) pairs minus the one identical pair
    assert(r.getAs[Long]("n_pairs") == (n + 1) * n / 2 - 1)
    assert(r.getAs[Double]("min_ratio") > 0.0)
    val mean = r.getAs[Double]("mean_ratio")
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean")
    // k = 16 has ratio std ≈ √(2/k) ≈ 0.35 (plus deterministic-row
    // correlation); the assert's job is to kill DEGENERATE matrices
    // (the rank-1 LCG-parity bug measured mean 0.04, p_within ≈ 0),
    // not to demand Gaussian-level concentration
    val within = r.getAs[Double]("p_within_eps")
    assert(within > 0.3, s"p_within_eps $within on isotropic data")
  }
}
