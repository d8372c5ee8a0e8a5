package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamProfiler

case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def t(min: Long) = new Timestamp(min * 60000L)

  test("windowed stream agg matches the batch equivalent; late data dropped") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamProfiler
      .windowedStats(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("winstats")
      .outputMode("append").start()
    try {
      // batch 1: two events in hour 0, one in hour 1
      mem.addData(Ev(t(5), "a", 1.0), Ev(t(20), "a", 3.0),
        Ev(t(70), "a", 5.0))
      q.processAllAvailable()
      // batch 2: advance watermark far => hour-0/1 windows close;
      // also inject a LATE hour-0 event that must be dropped
      mem.addData(Ev(t(500), "a", 7.0), Ev(t(6), "a", 100.0))
      q.processAllAvailable()
      mem.addData(Ev(t(2000), "a", 9.0))
      q.processAllAvailable()
      val out = spark.table("winstats")
        .orderBy("window_start_us").collect()
      val hour0 = out.find(_.getLong(0) == 0L).get
      assert(hour0.getAs[Long]("cnt") == 2L,
        "late event beyond watermark must not be counted")
      assert(hour0.getAs[Double]("avg_value") == 2.0)
      val hour1 = out.find(_.getLong(0) == 3600000000L).get
      assert(hour1.getAs[Long]("cnt") == 1L)
      // batch equivalence on the closed hour-0 window
      val batch = graft.ops.EventOps.windowedStats(
        Seq(Ev(t(5), "a", 1.0), Ev(t(20), "a", 3.0)).toDF()
          .withColumn("event_id", lit(1L)))
        .collect().head
      assert(batch.getAs[Long]("cnt") == hour0.getAs[Long]("cnt"))
      assert(batch.getAs[Double]("avg_value") ==
        hour0.getAs[Double]("avg_value"))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamProfiler.dedupWithinWatermark(
      mem.toDF(), Seq("event_type"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      mem.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 2.0),
        Ev(t(3), "b", 3.0))
      q.processAllAvailable()
      mem.addData(Ev(t(4), "a", 4.0)) // still within horizon => dropped
      q.processAllAvailable()
      val out = spark.table("dedupstream").collect()
      assert(out.map(_.getAs[String]("event_type")).sorted.toSeq ==
        Seq("a", "b"))
      assert(out.find(_.getAs[String]("event_type") == "a").get
        .getAs[Double]("value") == 1.0) // first occurrence wins
    } finally q.stop()
  }

  test("windowed numeric profile emits per-column rows") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamProfiler.windowedNumericProfile(
      mem.toDF(), "ts", Seq("value"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("numprof")
      .outputMode("append").start()
    try {
      mem.addData(Ev(t(1), "a", 2.0), Ev(t(2), "a", 4.0))
      q.processAllAvailable()
      mem.addData(Ev(t(900), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("numprof").collect()
      assert(rows.nonEmpty)
      val r = rows.find(_.getAs[String]("col_name") == "value").get
      assert(r.getAs[Long]("n") == 2L)
      assert(r.getAs[Double]("mean") == 3.0)
    } finally q.stop()
  }
}
