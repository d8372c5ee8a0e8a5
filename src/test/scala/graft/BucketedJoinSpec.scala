package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The 100 TB co-location story, demonstrated: writing both fact
  * tables bucketed on the join key turns the fact⋈fact hop into a
  * shuffle-free sort-merge join (README "Scale design notes"). The
  * test asserts the executed plan contains NO shuffle exchange —
  * bucket scans already satisfy the join's required distribution. */
class BucketedJoinSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("bucketed tables join without a shuffle exchange") {
    val s1 = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType)))
    val left = spark.createDataFrame(
      (1 to 1000).map(i => Row(i.toLong % 97, i.toDouble)).asJava, s1)
    val right = spark.createDataFrame(
      (1 to 500).map(i => Row(i.toLong % 97, i * 2.0)).asJava, s1)

    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    left.write.bucketBy(4, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.bucketBy(4, "k").sortBy("k").saveAsTable("bkt_right")

    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the assertion is about bucket
      // co-location, not about broadcasting the small side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), "k")
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    }
  }
}
