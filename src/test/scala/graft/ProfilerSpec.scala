package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.profiler.{Profiler, ProfilerConfig}

class ProfilerSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // id is a mod-41 permutation of 1..40: UNIQUE but uncorrelated with
  // x (a plain id=i would itself be corr-rejected against x)
  private val schema = StructType(Seq(
    StructField("id", LongType),          // UNIQUE
    StructField("x", DoubleType),         // NUM
    StructField("x2", DoubleType),        // CORR (2*x)
    StructField("k", StringType),         // CAT
    StructField("c", StringType),         // CONST
    StructField("ts", TimestampType)))    // DATE

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private val df = spark.createDataFrame(
    (1 to 40).map(i => Row(((i * 17) % 41).toLong, (i % 20).toDouble, 2.0 * (i % 20),
      if (i % 2 == 0) "even" else "odd", "const", ts((i % 10) * 3600L)))
      .asJava, schema)

  test("full profile: kinds, stats, quantiles, rejection, tidy output") {
    val p = Profiler.profile(df, ProfilerConfig())
    val byName = p.columns.map(c => c.name -> c).toMap
    assert(p.n == 40L && p.nvar == 6)
    assert(byName("id").kind == "UNIQUE")
    assert(byName("x").kind == "NUM")
    assert(byName("x2").kind == "CORR") // rejected, correlated with x
    assert(byName("k").kind == "CAT")
    assert(byName("c").kind == "CONST")
    assert(byName("ts").kind == "DATE")
    assert(p.rejected.map(r => (r._1, r._2)) == Seq(("x2", "x")))
    assert(byName("x").stats("mean") == 9.5)
    assert(byName("x").quantiles("median") == 9.5)
    assert(byName("k").topValues.map(_._1).sorted == Seq("even", "odd"))
    assert(byName("x").histogram.map(_._2).sum == 40L)
    assert(p.warnings.exists(_.contains("constant")))
    val tidy = Profiler.profileTidy(df)
    assert(tidy.count() > 40)
    assert(tidy.columns.toSeq ==
      Seq("col_name", "metric", "value_num", "value_str"))
  }

  test("scale config: approx distinct + approx quantiles still sane") {
    val p = Profiler.profile(df, ProfilerConfig(
      exactQuantiles = false, exactDistinct = false))
    val x = p.columns.find(_.name == "x").get
    assert(math.abs(x.quantiles("median") - 9.5) <= 1.0)
    assert(x.distinct >= 17 && x.distinct <= 23) // HLL estimate (5% rsd)
  }

  test("profile survives a MapType column (non-orderable distinct)") {
    val s = StructType(Seq(StructField("id", LongType),
      StructField("m", MapType(StringType, LongType))))
    val d = spark.createDataFrame(Seq(
      Row(1L, Map("a" -> 1L)), Row(2L, Map("b" -> 2L)),
      Row(3L, Map("a" -> 1L))).asJava, s)
    val p = Profiler.profile(d, ProfilerConfig(correlations = false))
    val m = p.columns.find(_.name == "m").get
    assert(m.kind == "CAT" && m.count == 3L)
    assert(m.distinct == 2L) // via canonical string proxy
    val report = ProfileReport(d, ProfilerConfig(correlations = false))
    assert(report.html.contains("col-m")) // sample orderBy survives maps
  }

  test("profile runs on every fixture table (arrays, nanos ts, json)") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val p = Profiler.profile(df, ProfilerConfig(
        exactDistinct = false, exactQuantiles = false))
      assert(p.n > 0, s"$t rows")
      assert(p.columns.size == df.columns.length, s"$t columns")
      assert(p.columns.forall(_.count <= p.n), s"$t counts")
    }
  }

  test("profile of all-null and single-row tables") {
    val s = StructType(Seq(StructField("a", DoubleType)))
    val allNull = spark.createDataFrame(
      Seq(Row(null), Row(null)).asJava, s)
    val p = Profiler.profile(allNull,
      ProfilerConfig(correlations = false))
    assert(p.columns.head.missing == 2L)
    val single = spark.createDataFrame(Seq(Row(7.0)).asJava, s)
    val p2 = Profiler.profile(single, ProfilerConfig(correlations = false))
    assert(p2.columns.head.kind == "CONST")
    assert(p2.columns.head.stats("mean") == 7.0)
  }
}
