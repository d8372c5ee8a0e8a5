package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.functions.BottomKSketch

class SketchSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(StructField("v", LongType)))

  private def mk(values: Seq[Long], partitions: Int) =
    spark.createDataFrame(values.map(Row(_)).asJava, schema)
      .repartition(partitions)

  test("exact below k; ~1/sqrt(k) accuracy above k") {
    val small = mk((1L to 100L) ++ (1L to 100L), 4) // 100 distinct, dups
    val (estS, sketchS) = BottomKSketch.distinctEstimate(small, "v", 256)
    assert(estS == 100.0) // below k => exact
    assert(sketchS.length == 100)

    val big = mk((1L to 20000L), 8)
    val (estB, _) = BottomKSketch.distinctEstimate(big, "v", 256)
    assert(math.abs(estB - 20000.0) / 20000.0 < 0.2,
      s"estimate $estB too far from 20000")
  }

  test("nulls are not counted as a distinct value") {
    val withNulls = spark.createDataFrame(
      ((1L to 50L).map(v => Row(java.lang.Long.valueOf(v))) ++
        Seq(Row(null), Row(null))).asJava, schema)
    val (est, sketch) = BottomKSketch.distinctEstimate(withNulls, "v", 256)
    assert(est == 50.0 && sketch.length == 50)
  }

  test("deterministic and partition-independent") {
    val values = (1L to 5000L).map(i => i % 1000L)
    val a = BottomKSketch.distinctEstimate(mk(values, 2), "v", 64)
    val b = BottomKSketch.distinctEstimate(mk(values, 16), "v", 64)
    assert(a._1 == b._1)
    assert(a._2.toSeq == b._2.toSeq)
    assert(a._2.toSeq == a._2.toSeq.sorted)
    assert(a._2.toSeq.distinct == a._2.toSeq) // distinct hashes only
  }
}
