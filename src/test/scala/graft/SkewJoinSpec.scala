package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("salted join is result-equivalent to the plain join under skew") {
    val bigSchema = StructType(Seq(StructField("k", LongType),
      StructField("payload", LongType)))
    // 90% of rows share key 7 — the hot-key shape
    val big = spark.createDataFrame(
      (1 to 5000).map(i =>
        Row(if (i % 10 == 0) (i % 50).toLong else 7L, i.toLong)).asJava,
      bigSchema).repartition(8)
    val smallSchema = StructType(Seq(StructField("k", LongType),
      StructField("dim", StringType)))
    val small = spark.createDataFrame(
      (0 to 49).map(i => Row(i.toLong, s"d$i")).asJava, smallSchema)

    val plain = big.join(small, "k")
      .select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", salt = 8)
      .select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join handles duplicate keys on the small side") {
    val s1 = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    val big = spark.createDataFrame(
      Seq(Row(1L, 10L), Row(1L, 11L), Row(2L, 20L)).asJava, s1)
    val small = spark.createDataFrame(
      Seq(Row(1L, 100L), Row(1L, 101L), Row(2L, 200L)).asJava, s1)
    val plain = big.join(small.withColumnRenamed("v", "w"), "k")
      .collect().length
    val salted = SkewJoin.saltedEquiJoin(big,
      small.withColumnRenamed("v", "w"), "k", salt = 4).collect().length
    assert(salted == plain && plain == 5)
  }
}
