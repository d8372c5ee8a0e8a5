package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.profiler.Stats

/** r16 optimization-round pins: the fused-window Spearman rank
  * transform must be BIT-identical to the two-window r15 form, and
  * the unsplittable-input repartition must be a no-op whenever the
  * scan already splits. */
class Round16OptSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("spearmanRanked equals the two-window average-rank form " +
      "bit-for-bit on tie-heavy data") {
    // heavy ties (x % 7) + a second column with distinct values + nulls
    val rows = (0 until 500).map { i =>
      Row(if (i % 31 == 0) null else Double.box((i % 7).toDouble),
        Double.box((i * 37 % 500) / 4.0))
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("a", DoubleType), StructField("b", DoubleType))))
      .repartition(3)
    val cols = Seq("a", "b")
    def d(c: String) = col(c).cast("double")
    val clean = df.na.drop(cols)
    // r17 (advisor): the pin is VALUE-ALIGNED, not a sorted multiset —
    // the average rank is a pure function of the value (every member
    // of a tie group gets the tie group's mean rank), so pairing each
    // distinct value with its rank in both forms catches a cross-row
    // permutation a multiset compare cannot.
    for (c <- cols) {
      // the r15 form: rank() + (count over partitionBy(value) - 1)/2
      val oldByValue = clean.select(
        d(c).as("v"),
        (rank().over(Window.orderBy(d(c))).cast("double") +
          (count(lit(1)).over(Window.partitionBy(d(c)))
            .cast("double") - lit(1.0)) / lit(2.0)).as("r"))
        .distinct().collect()
        .map(x => x.getDouble(0) -> x.getDouble(1)).toMap
      // the fused r16 form, with the value kept for alignment
      val byValue = Window.orderBy(d(c))
      val neuByValue = clean.select(
        d(c).as("v"),
        ((rank().over(byValue).cast("double") +
          count(lit(1)).over(byValue.rangeBetween(
            Window.unboundedPreceding, Window.currentRow))
            .cast("double")) / lit(2.0)).as("r"))
        .distinct().collect()
        .map(x => x.getDouble(0) -> x.getDouble(1)).toMap
      assert(oldByValue.keySet == neuByValue.keySet, s"$c: value sets")
      oldByValue.foreach { case (v, r) =>
        assert(java.lang.Double.doubleToRawLongBits(r) ==
          java.lang.Double.doubleToRawLongBits(neuByValue(v)),
          s"$c: value $v old rank $r vs new ${neuByValue(v)}")
      }
    }
    // and the API output matches the fused form as a multiset (the
    // public frame drops the value column, so alignment is above)
    for (c <- cols) {
      val byValue = Window.orderBy(d(c))
      val o = clean.select(
        ((rank().over(byValue).cast("double") +
          count(lit(1)).over(byValue.rangeBetween(
            Window.unboundedPreceding, Window.currentRow))
            .cast("double")) / lit(2.0)).as(c))
        .collect().map(_.getDouble(0)).sorted
      val n = Stats.spearmanRanked(df, cols)
        .select(c).collect().map(_.getDouble(0)).sorted
      assert(o.length == n.length)
      o.zip(n).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y), s"$c: $x vs $y")
      }
    }
  }

  test("parallelized() is a no-op when the scan already splits and " +
      "repartitions when it cannot") {
    val cores = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, cores).toDF("x")
    assert(Stats.parallelized(wide).rdd.getNumPartitions ==
      cores, "already-parallel input must pass through")
    val narrow = spark.range(0, 1000, 1, 1).toDF("x")
    assert(Stats.parallelized(narrow).rdd.getNumPartitions == cores,
      "single-partition input must repartition to defaultParallelism")
  }

  test("parallelized() keeps exact distinct counts identical") {
    val rows = (0 until 1000).map(i => Row(i % 97, s"v${i % 13}"))
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("n", IntegerType),
        StructField("s", StringType)))).coalesce(1)
    val a = df.agg(countDistinct(col("n")), countDistinct(col("s")))
      .first()
    val b = Stats.parallelized(df)
      .agg(countDistinct(col("n")), countDistinct(col("s"))).first()
    assert(a == b)
  }
}
