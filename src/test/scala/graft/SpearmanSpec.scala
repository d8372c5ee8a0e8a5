package graft

import org.apache.spark.sql.functions._
import graft.functions.GridRank
import graft.profiler.Stats

/** Spearman rank correlation: exact window form, the map-only
  * grid-rank approximation, and the native GridRank expression. */
class SpearmanSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(n: Long) = spark.range(n).select(
    col("id").cast("double").as("x"),
    // strictly monotone in x but wildly nonlinear
    pow(col("id").cast("double"), 3.0).as("cube"),
    // exact inverse order
    (lit(0.0) - col("id").cast("double")).as("neg"),
    // independent-ish: multiplicative-hash scramble
    pmod(col("id") * 2654435761L, lit(100000L)).cast("double")
      .as("noise"))

  test("exact Spearman: monotone transform gives rho = 1, reversal " +
      "gives -1, where Pearson underrates the cube") {
    val df = corpus(2000)
    val sp = Stats.spearmanMatrix(df, Seq("x", "cube", "neg"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    assert(sp(("x", "cube")) === 1.0)
    assert(sp(("x", "neg")) === -1.0)
    assert(sp(("cube", "neg")) === -1.0)
    val pe = Stats.corrMatrix(df, Seq("x", "cube"))
      .collect().head.getDouble(2)
    assert(pe < 0.95, s"Pearson on the cube is attenuated, got $pe")
  }

  test("exact Spearman with heavy ties (average ranks) matches the " +
      "closed-form on a hand-checkable set") {
    // x: [1,2,2,3]; y: [10,20,20,40] — identical tie structure in
    // the same places → rho exactly 1
    val df = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    val sp = Stats.spearmanMatrix(df, Seq("x", "y"))
      .collect().head.getDouble(2)
    assert(sp === 1.0)
    // perturb one tie: x [1,2,2,3], z [10,20,30,40] — textbook
    // average-rank Spearman = 0.9486832…; sig5 → 0.94868
    val df2 = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 40.0))
      .toDF("x", "z")
    val sp2 = Stats.spearmanMatrix(df2, Seq("x", "z"))
      .collect().head.getDouble(2)
    // sig5 emits the 5-significant-digit bucket's double (0.94868
    // up to representation): compare through the same rounding
    assert(sp2 === graft.det.Sig.sig5(0.9486832980505138),
      s"got $sp2")
  }

  test("spearmanApprox tracks exact Spearman within grid error on " +
      "monotone and scrambled columns, with no window in the plan") {
    val df = corpus(20000)
    val cols = Seq("x", "cube", "neg", "noise")
    val exact = Stats.spearmanMatrix(df, cols)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    val approx = Stats.spearmanApprox(df, cols, grid = 1024)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e) < 0.02, s"$k exact=$e approx=$a")
    }
    // the transform must be map-only: no Window, no global Sort
    // before the aggregation
    val plan = Stats.spearmanApprox(df, cols, grid = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx path must not sort")
  }

  test("GridRank: leftmost-tie binary search, null passthrough, " +
      "endpoints") {
    val grid = Array(1.0, 2.0, 2.0, 2.0, 5.0)
    val df = Seq[java.lang.Double](0.0, 1.0, 1.5, 2.0, 3.0, 5.0, 9.0,
        null)
      .toDF("v")
    val got = df.select(GridRank.grid_rank(col("v"), grid).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    // lower-bound counts grid points strictly below v, /5
    assert(got(0) === 0.0) // below all
    assert(got(1) === 0.0) // == first element → leftmost
    assert(got(2) === 0.2)
    assert(got(3) === 0.2) // leftmost of the 2.0 run
    assert(got(4) === 0.8)
    assert(got(5) === 0.8) // leftmost occurrence of 5.0
    assert(got(6) === 1.0) // above all
    assert(got(7) === null)
  }
}
