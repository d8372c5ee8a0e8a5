package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ExactPercentile

/** r16: ExactPercentileAgg must be BIT-identical to the built-in
  * `percentile(col, array(...))` on double input — the declared
  * quantile queries' oracle hashes ride on it. */
class ExactPercentileSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
  private val schema = StructType(Seq(
    StructField("x", DoubleType, nullable = true)))

  private def both(vals: Seq[java.lang.Double], parts: Int)
      : (Seq[Any], Seq[Any]) = {
    val df = spark.createDataFrame(
      vals.map(v => Row(v)).asJava, schema).repartition(parts)
    val arr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val b = df.agg(expr(s"percentile(x, $arr)")).first()
    val f = df.agg(ExactPercentile.pctl(col("x"), ps)).first()
    def seqOf(r: Row): Seq[Any] =
      if (r.isNullAt(0)) null else r.getSeq[Any](0)
    (seqOf(b), seqOf(f))
  }

  private def bitsEqual(a: Seq[Any], b: Seq[Any]): Boolean =
    (a, b) match {
      case (null, null) => true
      case (x, y) if x == null || y == null => false
      case (x, y) =>
        x.length == y.length && x.zip(y).forall { case (u, v) =>
          java.lang.Double.doubleToRawLongBits(
            u.asInstanceOf[Double]) ==
            java.lang.Double.doubleToRawLongBits(
              v.asInstanceOf[Double])
        }
    }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(i.toLong)))

  test("bit-identical to built-in percentile on random data with " +
      "ties, nulls, negatives, multiple partitions") {
    val genVal: Gen[java.lang.Double] = Gen.frequency(
      (6, Gen.chooseNum(-1000, 1000).map(i =>
        java.lang.Double.valueOf(i / 8.0))),
      (2, Gen.chooseNum(0, 20).map(i =>
        java.lang.Double.valueOf(i.toDouble))), // heavy ties
      (1, Gen.const(null: java.lang.Double)),
      (1, Gen.chooseNum(-1e12, 1e12).map(d =>
        java.lang.Double.valueOf(d / 1e3))))
    val gen = for {
      n <- Gen.chooseNum(0, 300)
      vs <- Gen.listOfN(n, genVal)
      parts <- Gen.chooseNum(1, 5)
    } yield (vs, parts)
    samples(gen, 25).foreach { case (vs, parts) =>
      val (b, f) = both(vs, parts)
      assert(bitsEqual(b, f), s"n=${vs.size} parts=$parts: $b vs $f")
    }
  }

  test("edge cases: empty, single, all-equal, -0.0 vs 0.0, extremes") {
    val cases: Seq[Seq[java.lang.Double]] = Seq(
      Seq.empty,
      Seq(null),
      Seq(java.lang.Double.valueOf(3.5)),
      Seq.fill(17)(java.lang.Double.valueOf(2.0)),
      Seq(-0.0, 0.0, -0.0, 1.0, -1.0).map(java.lang.Double.valueOf),
      Seq(Double.MaxValue, Double.MinValue, Double.MinPositiveValue,
        -Double.MaxValue, 0.0).map(java.lang.Double.valueOf))
    for (vs <- cases; parts <- Seq(1, 3)) {
      val (b, f) = both(vs, parts)
      assert(bitsEqual(b, f), s"case $vs parts=$parts: $b vs $f")
    }
  }

  test("grouped aggregation matches built-in per group") {
    val rows = (0 until 500).map { i =>
      Row(s"g${i % 7}", (i % 41) / 4.0)
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("g", StringType),
        StructField("x", DoubleType))))
      .repartition(4)
    val arr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val b = df.groupBy("g").agg(expr(s"percentile(x, $arr)").as("q"))
      .orderBy("g").collect().map(_.getSeq[Double](1))
    val f = df.groupBy("g")
      .agg(ExactPercentile.pctl(col("x"), ps).as("q"))
      .orderBy("g").collect().map(_.getSeq[Double](1))
    assert(b.length == f.length)
    b.zip(f).foreach { case (x, y) =>
      assert(bitsEqual(x, y), s"$x vs $y")
    }
  }
}
