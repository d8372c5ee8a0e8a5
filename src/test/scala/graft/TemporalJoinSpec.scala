package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.TemporalJoin

/** As-of join and point-in-interval join: semantics on crafted edge
  * cases, equivalence with the naive quadratic formulations, and the
  * plan-shape guarantees (no nested-loop/cartesian operators) that
  * make them usable on 100 TB event logs. */
class TemporalJoinSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("us", LongType), StructField("value", DoubleType)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, evSchema)

  // user 1: rights at 10 (id 100), 20 (id 101), tie pair at 30
  // (ids 102, 103); user 2: no rights at all
  private val right = df(Seq(
    Row(100L, 1L, 10L, 1.0), Row(101L, 1L, 20L, 2.0),
    Row(102L, 1L, 30L, 3.0), Row(103L, 1L, 30L, 4.0)))
  private val left = df(Seq(
    Row(200L, 1L, 5L, 0.0),   // before every right: no match
    Row(201L, 1L, 15L, 0.0),  // between 10 and 20: matches 100
    Row(202L, 1L, 20L, 0.0),  // exactly at a right ts: inclusive, 101
    Row(203L, 1L, 31L, 0.0),  // after the tie: max-id right 103
    Row(204L, 2L, 50L, 0.0))) // keyed user with zero rights

  test("asof join: inclusive <=, tie toward max id, unmatched survives") {
    val r = TemporalJoin.asofJoin(
      left.select("event_id", "user_id", "us"), right,
      key = "user_id", ts = "us", idCol = "event_id",
      rightVals = Seq("value")).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(200L).isNullAt(3) && r(200L).isNullAt(5))
    assert(r(201L).getLong(3) == 100L && r(201L).getLong(5) == 5L)
    assert(r(202L).getLong(3) == 101L && r(202L).getLong(5) == 0L)
    assert(r(203L).getLong(3) == 103L &&
      r(203L).getAs[Double]("matched_value") == 4.0)
    assert(r(204L).isNullAt(3))
    assert(r.size == 5) // every left row exactly once
  }

  test("asof join: tolerance nulls stale matches but keeps the row") {
    val r = TemporalJoin.asofJoin(
      left.select("event_id", "user_id", "us"), right,
      key = "user_id", ts = "us", idCol = "event_id",
      rightVals = Seq("value"), toleranceUs = Some(5L)).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.size == 5)
    assert(r(201L).getLong(3) == 100L) // gap 5 == tolerance: kept
    assert(r(202L).getLong(3) == 101L) // gap 0
    assert(r(203L).getLong(3) == 103L) // gap 1
    // no row has a gap > 5 with a non-null match
    assert(r.values.forall(x => x.isNullAt(5) || x.getLong(5) <= 5L))
  }

  test("asof join matches the naive quadratic formulation on random data") {
    val rnd = new scala.util.Random(7)
    def gen(n: Int, off: Long) = df((0 until n).map(i =>
      Row(off + i, rnd.nextInt(5).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(100) / 10.0)))
    val l = gen(60, 1000L).select("event_id", "user_id", "us")
    val rr = gen(60, 2000L)
    val fast = TemporalJoin.asofJoin(l, rr, "user_id", "us", "event_id",
      Seq("value"), toleranceUs = Some(10L))
    l.createOrReplaceTempView("tj_l"); rr.createOrReplaceTempView("tj_r")
    val naive = spark.sql(
      """SELECT event_id, user_id, us,
        |CASE WHEN ok THEN m_eid END AS matched_event_id,
        |CASE WHEN ok THEN m_us END AS matched_us,
        |CASE WHEN ok THEN us - m_us END AS gap_us,
        |CASE WHEN ok THEN m_val END AS matched_value FROM (
        |  SELECT *, m_us IS NOT NULL AND us - m_us <= 10 AS ok FROM (
        |    SELECT l.event_id, l.user_id, l.us, r.event_id AS m_eid,
        |      r.us AS m_us, r.value AS m_val,
        |      row_number() OVER (PARTITION BY l.event_id
        |        ORDER BY r.us DESC, r.event_id DESC) AS rn
        |    FROM tj_l l LEFT JOIN tj_r r
        |    ON r.user_id = l.user_id AND r.us <= l.us) WHERE rn = 1)
        |ORDER BY event_id""".stripMargin)
    assert(fast.collect().toSeq == naive.collect().toSeq)
  }

  test("asof join plan: one window, zero join operators") {
    val plan = TemporalJoin.asofJoin(
      left.select("event_id", "user_id", "us"), right,
      "user_id", "us", "event_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join operator:\n$plan")
    assert(plan.contains("Window"))
  }

  private val ivSchema = StructType(Seq(
    StructField("iv_id", LongType), StructField("user_id", LongType),
    StructField("lo", LongType), StructField("hi", LongType)))

  test("point-in-interval: boundaries inclusive, multi-bucket spans, overlaps") {
    val ivs = spark.createDataFrame(Seq(
      Row(1L, 1L, 10L, 30L),   // spans buckets 1..3 at width 10
      Row(2L, 1L, 25L, 26L),   // overlaps interval 1
      Row(3L, 1L, 40L, 40L),   // degenerate single-point interval
      Row(4L, 1L, 60L, 50L),   // empty (end < start): dropped
      Row(5L, 2L, 10L, 30L)    // other key: never matches user 1
    ).asJava, ivSchema)
    val pts = df(Seq(
      Row(300L, 1L, 10L, 0.0),  // at interval 1's start
      Row(301L, 1L, 30L, 0.0),  // at interval 1's end
      Row(302L, 1L, 25L, 0.0),  // inside BOTH 1 and 2
      Row(303L, 1L, 40L, 0.0),  // the degenerate interval
      Row(304L, 1L, 55L, 0.0),  // inside the empty interval's range
      Row(305L, 1L, 31L, 0.0))) // just outside interval 1
      .select("event_id", "user_id", "us")
    val got = TemporalJoin.pointInInterval(pts, ivs, "user_id", "us",
      "lo", "hi", bucketUs = 10L,
      pointProj = Seq("event_id"), intervalProj = Seq("iv_id"))
      .select("event_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((300L, 1L), (301L, 1L), (302L, 1L), (302L, 2L),
      (303L, 3L)))
  }

  test("point-in-interval matches the inequality join on random data") {
    val rnd = new scala.util.Random(11)
    val pts = df((0 until 80).map(i =>
      Row(i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, 0.0)))
      .select("event_id", "user_id", "us")
    val ivs = spark.createDataFrame((0 until 25).map { i =>
      val lo = rnd.nextInt(90).toLong
      Row(i.toLong, rnd.nextInt(4).toLong, lo, lo + rnd.nextInt(25))
    }.asJava, ivSchema)
    val fast = TemporalJoin.pointInInterval(pts, ivs, "user_id", "us",
      "lo", "hi", bucketUs = 7L,
      pointProj = Seq("event_id"), intervalProj = Seq("iv_id"))
      .select("event_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(ivs, Seq("user_id"))
      .where(col("us") >= col("lo") && col("us") <= col("hi"))
      .select("event_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && naive.nonEmpty)
  }

  test("point-in-interval plan: equi-join only, no nested loop / cartesian") {
    val ivs = spark.createDataFrame(
      Seq(Row(1L, 1L, 10L, 30L)).asJava, ivSchema)
    val plan = TemporalJoin.pointInInterval(
      left.select("event_id", "user_id", "us"), ivs, "user_id", "us",
      "lo", "hi", bucketUs = 10L, Seq("event_id"), Seq("iv_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"quadratic join operator in plan:\n$plan")
  }
}
