package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Chunking, Drift, EventOps, Sampling, Search}
import graft.profiler.Stats

/** Micro-fixture edge cases for the round-4 operators (ADVICE r4):
  * all-null / empty / constant inputs for outliers and drift, the
  * mixtureSample absent-stratum contract, chunk window boundaries,
  * cube grouping-id semantics, and linearScore determinism. */
class EdgeCaseSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val numSchema = StructType(Seq(
    StructField("id", LongType), StructField("x", DoubleType)))
  private def nums(rows: (Long, java.lang.Double)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, numSchema)

  // ---------------------------------------------------------------
  // Stats.outliers
  // ---------------------------------------------------------------

  test("outliers: crafted column counts strictly-outside values") {
    // 1..8 plus extremes: q1=2.75, q3=7.25 (Hive/linear interpolation
    // over the 10 values 1..8,100,-100 sorted: -100,1..8,100)
    val d = nums((1L to 8L).map(i => i -> java.lang.Double.valueOf(i.toDouble)) ++
      Seq(9L -> java.lang.Double.valueOf(100.0),
          10L -> java.lang.Double.valueOf(-100.0)): _*)
    val r = Stats.outliers(d, Seq("x")).collect()(0)
    assert(r.getAs[Long]("n_below") == 1 && r.getAs[Long]("n_above") == 1)
    val q1 = r.getAs[Double]("q1"); val q3 = r.getAs[Double]("q3")
    assert(q1 > -100 && q1 < q3 && q3 < 100)
    assert(r.getAs[Double]("fence_lo") < q1)
    assert(r.getAs[Double]("fence_hi") > q3)
    assert(math.abs(r.getAs[Double]("p_outlier") - 0.2) < 1e-9)
  }

  test("outliers: all-null column yields NULL fences, not 0.0") {
    val d = nums(1L -> null, 2L -> null, 3L -> null)
    val r = Stats.outliers(d, Seq("x")).collect()(0)
    assert(r.getAs[String]("col_name") == "x")
    Seq("q1", "q3", "fence_lo", "fence_hi", "n_below", "n_above",
      "p_outlier").foreach { f =>
      assert(r.isNullAt(r.fieldIndex(f)), s"$f must be NULL")
    }
  }

  test("outliers: empty table yields NULL fences and counts") {
    val d = nums().where(lit(false))
    val r = Stats.outliers(d, Seq("x")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("fence_lo")))
    assert(r.isNullAt(r.fieldIndex("p_outlier")))
  }

  test("outliers: mixed all-null and live columns coexist in one pass") {
    val s2 = StructType(numSchema.fields :+ StructField("y", DoubleType))
    val d = spark.createDataFrame(Seq(
      Row(1L, null, 1.0), Row(2L, null, 2.0), Row(3L, null, 1000.0),
      Row(4L, null, 3.0), Row(5L, null, 2.0)).asJava, s2)
    val rows = Stats.outliers(d, Seq("x", "y")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows("x").isNullAt(rows("x").fieldIndex("fence_hi")))
    assert(rows("y").getAs[Long]("n_above") == 1) // the 1000.0
  }

  // ---------------------------------------------------------------
  // Drift
  // ---------------------------------------------------------------

  private val drSchema = StructType(Seq(
    StructField("v", DoubleType), StructField("s", IntegerType)))
  private def dr(rows: (java.lang.Double, Int)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, drSchema)

  test("drift: identical slices score psi=0 tvd=0") {
    val d = dr((1 to 50).flatMap(i =>
      Seq(java.lang.Double.valueOf((i % 5).toDouble) -> 0,
          java.lang.Double.valueOf((i % 5).toDouble) -> 1)): _*)
    val r = Drift.numericDrift(d, "dim", col("v"), col("s"), bins = 5)
      .collect()(0)
    assert(r.getAs[Double]("psi") == 0.0 && r.getAs[Double]("tvd") == 0.0)
    assert(r.getAs[Long]("n_a") == 50 && r.getAs[Long]("n_b") == 50)
  }

  test("drift: constant column (w=0) degenerates to one bucket, psi 0") {
    val d = dr((1 to 20).map(i =>
      java.lang.Double.valueOf(7.0) -> (i % 2)): _*)
    val r = Drift.numericDrift(d, "dim", col("v"), col("s")).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_buckets") == 1)
    assert(r(0).getAs[Double]("psi") == 0.0)
  }

  test("drift: all-null value column yields ZERO rows, not a NULL row") {
    val d = dr((1 to 10).map(i => (null: java.lang.Double) -> (i % 2)): _*)
    assert(Drift.numericDrift(d, "dim", col("v"), col("s")).count() == 0)
  }

  test("drift: disjoint slices drive tvd toward 1") {
    // slice 0 all in low bucket, slice 1 all in high bucket
    val d = dr((1 to 40).map(i =>
      if (i % 2 == 0) java.lang.Double.valueOf(0.0) -> 0
      else java.lang.Double.valueOf(9.0) -> 1): _*)
    val r = Drift.numericDrift(d, "dim", col("v"), col("s"), bins = 2)
      .collect()(0)
    assert(r.getAs[Double]("tvd") > 0.9)
    assert(r.getAs[Double]("psi") > 0.25) // "shifted" rule of thumb
  }

  // ---------------------------------------------------------------
  // Sampling.mixtureSample
  // ---------------------------------------------------------------

  private val stSchema = StructType(Seq(
    StructField("id", LongType), StructField("dom", StringType)))
  private def st(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, stSchema)

  test("mixtureSample: exact 2:1 mixture, binding stratum fully kept") {
    val d = st(((1L to 10L).map(_ -> "web") ++
      (11L to 13L).map(_ -> "code")): _*)
    // web:code = 2:1, code has 3 → scale = 3 ⇒ 6 web + 3 code
    val r = Sampling.mixtureSample(d, "dom", "id",
      Map("web" -> 2.0, "code" -> 1.0))
    val counts = r.groupBy("dom").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts == Map("web" -> 6L, "code" -> 3L))
    // deterministic: lowest ids first
    assert(r.agg(max(when(col("dom") === "web", col("id"))))
      .collect()(0).getLong(0) == 6L)
  }

  test("mixtureSample: absent weights stratum fails loudly") {
    val d = st((1L to 5L).map(_ -> "web"): _*)
    val ex = intercept[Exception] {
      Sampling.mixtureSample(d, "dom", "id",
        Map("web" -> 1.0, "nosuch" -> 1.0)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("absent from data")))
  }

  // ---------------------------------------------------------------
  // Chunking
  // ---------------------------------------------------------------

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, docSchema)

  test("chunk: stride<size overlaps, boundary windows partial") {
    val d = docs(0L -> "a b c d e") // 5 tokens, size 3 stride 2
    val r = Chunking.chunkTokens(d, "doc_id", "text", size = 3, stride = 2)
      .orderBy("chunk_idx").collect()
    assert(r.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("a b c", "c d e", "e"))
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 3L, 1L))
  }

  test("chunk: doc shorter than size yields exactly one chunk") {
    val d = docs(0L -> "only two")
    val r = Chunking.chunkTokens(d, "doc_id", "text", 128, 128).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_tokens") == 2L)
  }

  test("chunk: exact-multiple length has no empty trailing window") {
    val d = docs(0L -> "a b c d") // 4 tokens, size 2 stride 2
    val r = Chunking.chunkTokens(d, "doc_id", "text", 2, 2)
      .orderBy("chunk_idx").collect()
    assert(r.map(_.getAs[String]("chunk_text")).toSeq == Seq("a b", "c d"))
  }

  test("chunk: empty text still yields one chunk (packing contract)") {
    val d = docs(0L -> "")
    val r = Chunking.chunkTokens(d, "doc_id", "text", 4, 4).collect()
    assert(r.length == 1 && r(0).getAs[Long]("chunk_idx") == 0L)
  }

  // ---------------------------------------------------------------
  // EventOps.cubeStats
  // ---------------------------------------------------------------

  test("cube: grouping id bit order and cross-marginal counts") {
    val evSchema = StructType(Seq(
      StructField("ts", LongType), // nanos path
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val hourNs = 3600L * 1000000000L
    val d = spark.createDataFrame(Seq(
      Row(0L * hourNs, "click", 1.0), Row(0L * hourNs, "view", 2.0),
      Row(1L * hourNs, "click", 3.0)).asJava, evSchema)
    val r = EventOps.cubeStats(d).collect()
    val byKey = r.map(x => (x.getAs[Long]("gid"),
      x.getAs[String]("event_type"), x.getAs[Any]("hour")) -> x).toMap
    // gid 0: full detail; gid 1 (hour bit): per-type totals;
    // gid 2 (type bit): per-hour totals; gid 3: grand total
    assert(byKey((0L, "click", 0L)).getAs[Long]("cnt") == 1)
    assert(byKey((1L, "click", null)).getAs[Long]("cnt") == 2)
    assert(byKey((2L, null, 0L)).getAs[Long]("cnt") == 2)
    assert(byKey((3L, null, null)).getAs[Long]("cnt") == 3)
    assert(byKey((3L, null, null)).getAs[Double]("sum_value") == 6.0)
  }

  // ---------------------------------------------------------------
  // Search.linearScore
  // ---------------------------------------------------------------

  test("linearScore: sigmoid of the MINSTD surrogate, keep at 0.5") {
    val d = docs(0L -> "t t t", 1L -> "u")
    val r = Search.linearScore(d, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // token 't' has corpus count 3, 'u' count 1; re-derive the MINSTD
    // mille surrogate weight exactly as the operator defines it
    def mille(id: Long): Long = {
      val m = 2147483647L; val a = 48271L
      val h0 = (id + 12345L) % m
      ((h0 * a % m) * a % m) % 1000L
    }
    def score(c: Long): Double = {
      val w = (mille(c).toDouble - 499.5) / 499.5
      1.0 / (1.0 + math.exp(-w))
    }
    assert(math.abs(r(0L).getAs[Double]("score") - score(3)) < 1e-4)
    assert(math.abs(r(1L).getAs[Double]("score") - score(1)) < 1e-4)
    r.values.foreach { x =>
      assert(x.getAs[Boolean]("keep") == (x.getAs[Double]("score") >= 0.5))
    }
  }
}
