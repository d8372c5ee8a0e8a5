package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import graft.ops.Quality
import graft.ops.Quality._
import graft.det.Sig

/** Declarative data-quality suite: check semantics (nulls, vacuous
  * denominators, pass/fail thresholds), single-scan plan shape,
  * per-group ≡ per-filter equality, the HLL scale path, and the
  * two-pass suggestion gate. */
class QualitySpec extends SparkSpec {

  private def fixture: DataFrame = {
    val s = spark
    import s.implicits._
    // id unique; cat ∈ {a,b} with one null; v ∈ [0,10] with one -5
    // outlier and one null; allnull exercises the vacuous ratio
    Seq(
      (1L, Some("a"), Some(2.0), Option.empty[String]),
      (2L, Some("a"), Some(4.0), Option.empty[String]),
      (3L, Some("b"), Some(10.0), Option.empty[String]),
      (4L, Some("b"), Some(-5.0), Option.empty[String]),
      (5L, None, None, Option.empty[String])
    ).toDF("id", "cat", "v", "allnull")
  }

  test("runChecks: observed ratios, null handling, pass/fail") {
    val checks = Seq(
      Completeness("cat", 0.9),      // 4/5 = 0.8 → FAIL
      Completeness("id", 1.0),       // 5/5 → pass
      Uniqueness("id", 1.0),         // 5 distinct / 5 → pass
      Uniqueness("cat", 0.9),        // 2 distinct / 4 = 0.5 → FAIL
      InRange("v", 0.0, 10.0, 1.0),  // 3 of 4 non-null → 0.75 FAIL
      InRange("v", -10.0, 10.0, 1.0), // 4/4 → pass
      InSet("cat", Seq("a"), 0.5),   // 2 of 4 → 0.5 → pass (inclusive)
      Matches("cat", "^[ab]$", 1.0), // 4/4 → pass
      MeanBetween("v", 2.0, 3.0),    // mean 2.75 → pass
      Completeness("allnull", 0.5),  // 0/5 = 0.0 → FAIL
      Uniqueness("allnull", 0.1),    // 0 distinct / 0 → vacuous 1.0 pass
      RowCountBetween(5L, 5L))
    val out = Quality.runChecks(fixture, checks).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(5))).toSet
    assert(out == Set(
      ("completeness", "cat", 0.8, 0L),
      ("completeness", "id", 1.0, 1L),
      ("completeness", "allnull", 0.0, 0L),
      ("uniqueness", "id", 1.0, 1L),
      ("uniqueness", "cat", 0.5, 0L),
      ("uniqueness", "allnull", 1.0, 1L),
      ("in_range", "v", 0.75, 0L),
      ("in_range", "v", 1.0, 1L),
      ("in_set", "cat", 0.5, 1L),
      ("matches", "cat", 1.0, 1L),
      ("mean_between", "v", Sig.sig5(2.75), 1L),
      ("row_count", "*", 5.0, 1L)))
  }

  test("runChecks without uniqueness compiles to ONE aggregate over " +
      "one scan (shared metrics deduped)") {
    val checks = Seq(
      Completeness("cat", 0.9), Completeness("v", 0.9),
      InRange("v", 0.0, 10.0, 1.0), InSet("cat", Seq("a"), 0.5),
      MeanBetween("v", 2.0, 3.0), RowCountBetween(1L, 100L))
    val df = Quality.runChecks(fixture, checks)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a
    }
    assert(aggs.size == 1, s"expected one Aggregate, got ${aggs.size}")
    assert(df.count() == checks.size)
  }

  test("runChecksByGroup equals runChecks on each group's filter") {
    val checks = Seq(
      Completeness("cat", 0.9), InRange("v", 0.0, 10.0, 1.0),
      MeanBetween("v", 0.0, 5.0), RowCountBetween(1L, 3L))
    val df = fixture.withColumn("grp",
      when(col("id") <= 2L, "g1").otherwise("g2"))
    val grouped = Quality.runChecksByGroup(df, Seq("grp"), checks)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(6)))
    for (g <- Seq("g1", "g2")) {
      val direct = Quality.runChecks(df.where(col("grp") === g), checks)
        .collect()
        .map(r => (g, r.getString(0), r.getString(1), r.getDouble(2),
          r.getLong(5)))
      assert(grouped.filter(_._1 == g).toSet == direct.toSet,
        s"group $g diverges from its filtered direct run")
    }
  }

  test("approxUnique scale path: HLL uniqueness lands within rsd of " +
      "exact and every non-distinct metric is unchanged") {
    val s = spark
    import s.implicits._
    val big = (1L to 2000L).map(i => (i, s"k${i % 500}"))
      .toDF("id", "key")
    val checks = Seq(Uniqueness("key", 0.9), Completeness("key", 1.0))
    val exact = Quality.runChecks(big, checks).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    val approx = Quality.runChecks(big, checks, approxUnique = true)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(approx("completeness") == exact("completeness"))
    // default rsd 5%: 500/2000 = 0.25 exact
    assert(math.abs(approx("uniqueness") - exact("uniqueness")) <= 0.05,
      s"approx ${approx("uniqueness")} vs exact ${exact("uniqueness")}")
  }

  test("suggest: rules derived from data; high-cardinality string " +
      "column is NOT collected (two-pass gate)") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L)
      .map(i => (i, if (i <= 50) "x" else "y", s"u$i",
        if (i == 7) None else Some(i * 2.0)))
      .toDF("id", "flag", "highcard", "score")
    val out = Quality.suggest(df,
      Seq("id", "flag", "highcard", "score"), lowCard = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
    val rules = out.map(t => (t._1, t._2)).toSet
    assert(rules.contains(("id", "not_null")))
    assert(rules.contains(("id", "unique")))
    assert(rules.contains(("id", "value_range")))
    assert(rules.contains(("id", "non_negative")))
    assert(rules.contains(("flag", "is_in")))
    assert(rules.contains(("highcard", "not_null")))
    assert(rules.contains(("highcard", "unique")))
    // 100 distinct > lowCard → no is_in for highcard
    assert(!rules.contains(("highcard", "is_in")))
    // score has a null → no not_null; has no is_in (numeric)
    assert(!rules.contains(("score", "not_null")))
    val isin = out.find(t => t._1 == "flag" && t._2 == "is_in").get
    assert(isin._3 == "x,y")
    val rng = out.find(t => t._1 == "id" && t._2 == "value_range").get
    assert(rng._4 == 1.0 && rng._5 == 100.0)
    val srng = out.find(t => t._1 == "score" && t._2 == "value_range").get
    assert(srng._4 == 2.0 && srng._5 == 200.0)
  }

  test("closure: suggestedChecks from suggest() all PASS on the " +
      "corpus that produced them") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L)
      .map(i => (i, if (i % 3 == 0) "a" else "b", i * 1.5,
        if (i % 7 == 0) None else Some(s"v${i % 40}")))
      .toDF("id", "cat", "score", "sparse")
    val cols = Seq("id", "cat", "score", "sparse")
    val suggested = Quality.suggestedChecks(Quality.suggest(df, cols))
    assert(suggested.nonEmpty)
    val res = Quality.runChecks(df, suggested).collect()
    assert(res.forall(_.getLong(5) == 1L),
      s"closure violated: ${res.filter(_.getLong(5) == 0L).mkString}")
    // and the suite is a real gate: a drifted corpus FAILS it
    val drifted = df.withColumn("cat",
      when(col("id") === 1L, "NEW_VALUE").otherwise(col("cat")))
    val dres = Quality.runChecks(drifted, suggested).collect()
    assert(dres.exists(r => r.getString(0) == "in_set" &&
      r.getString(1) == "cat" && r.getLong(5) == 0L))
  }

  test("benford: digit classification exact at boundaries, nulls/" +
      "zeros/negatives handled, TVD separates log-spread from " +
      "uniform data") {
    val s = spark
    import s.implicits._
    // boundary values: exact powers of ten, sub-1 magnitudes (the
    // negative-exponent pow trap), negatives (use |x|), zero + null
    // (excluded)
    val edge = Seq(Some(10.0), Some(100.0), Some(0.02), Some(0.1),
      Some(-300.0), Some(9.999), Some(0.0), None)
      .toDF("x")
    val er = Quality.benford(edge, "x").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // digits: 1 (10), 1 (100), 2 (0.02), 1 (0.1), 3 (-300), 9 (9.999)
    // → 6 values: d1 3/6, d2 1/6, d3 1/6, d9 1/6
    assert(math.abs(er(1L) - 0.5) < 1e-9)
    assert(math.abs(er(2L) - 1.0 / 6) < 1e-6)
    assert(math.abs(er(3L) - 1.0 / 6) < 1e-6)
    assert(math.abs(er(9L) - 1.0 / 6) < 1e-6)
    assert(er(4L) == 0.0)

    // log-spread data (x = 10^(i/500), 3 decades) ≈ Benford; uniform
    // [1, 10) data is far from it — TVD must separate the two
    val conforming = (0 until 1500).map(i => math.pow(10.0, i / 500.0))
      .toDF("x")
    val uniform = (0 until 1500).map(i => 1.0 + 9.0 * i / 1500.0)
      .toDF("x")
    def tvd(df0: org.apache.spark.sql.DataFrame): Double =
      Quality.benford(df0, "x").collect()
        .find(_.getLong(0) == 0L).get.getDouble(1)
    val tc = tvd(conforming); val tu = tvd(uniform)
    assert(tc < 0.02, s"log-spread TVD $tc should be ~0")
    assert(tu > 0.2, s"uniform TVD $tu should be large")
  }

  test("MinBetween/MaxBetween: raw extrema checked, all-null column " +
      "passes vacuously at lo") {
    val checks = Seq(
      MinBetween("v", -5.0, -5.0),   // min is exactly -5 → pass
      MinBetween("v", 0.0, 10.0),    // min -5 below floor → FAIL
      MaxBetween("v", 5.0, 20.0),    // max 10 → pass
      MaxBetween("v", 0.0, 5.0),     // max 10 above cap → FAIL
      MinBetween("allnull", 1.0, 2.0)) // vacuous: observes lo → pass
    val out = Quality.runChecks(fixture, checks).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getLong(5))).toSet
    assert(out == Set(
      ("min_between", "v", -5.0, -5.0, 1L),
      ("min_between", "v", -5.0, 0.0, 0L),
      ("max_between", "v", 10.0, 5.0, 1L),
      ("max_between", "v", 10.0, 0.0, 0L),
      ("min_between", "allnull", 1.0, 1.0, 1L)))
  }

  test("suggest approxUnique: same rules as exact on clear-cut " +
      "columns, including the unique rule on a big unique column") {
    val s = spark
    import s.implicits._
    val df = (1L to 5000L)
      .map(i => (i, s"k${i % 100}", i * 0.5))
      .toDF("id", "key", "score")
    val cols = Seq("id", "key", "score")
    def rules(approx: Boolean) =
      Quality.suggest(df, cols, approxUnique = approx).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val exact = rules(approx = false)
    val approx = rules(approx = true)
    assert(exact.contains(("id", "unique")))
    assert(approx.contains(("id", "unique")),
      "HLL tolerance must still surface the unique rule")
    assert(exact == approx,
      s"exact $exact vs approx $approx diverged on clear-cut columns")
  }

  test("quality_manifest: every table in the warehouse passes its " +
      "generic gate (keys complete + unique, tables non-empty)") {
    val out = graft.queries.QualityQueries.queries("quality_manifest")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length ==
      graft.queries.QualityQueries.manifestTables.size * 3)
    val failed = out.filter(_.getLong(6) == 0L)
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(failed.isEmpty, s"manifest failures: ${failed.mkString}")
  }

  test("benford: a column with no positive values emits zeros, " +
      "never NULLs") {
    val s = spark
    import s.implicits._
    val df = Seq(Option.empty[Double], Some(0.0), Some(0.0), None)
      .toDF("x")
    val out = Quality.benford(df, "x").collect()
    assert(out.length == 10)
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(2) &&
      !r.isNullAt(3)))
    // per-digit observed 0; the TVD row then reports Σ|0−expected|/2
    // = 0.5 — a no-data corpus FAILS a conformance gate (fail
    // closed) instead of silently passing
    assert(out.filter(_.getLong(0) >= 1L).forall(_.getDouble(1) == 0.0))
    assert(out.find(_.getLong(0) == 0L).get.getDouble(1) == 0.5)
  }
}
