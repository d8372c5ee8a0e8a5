package graft

import org.apache.spark.sql.functions._
import graft.ops.CatStats

/** Count–Min sketch (round 12): the one-sided guarantee holds on a
  * skewed fixture, a deliberately tiny sketch really overestimates
  * (the contract is doing work, not vacuous), and shard-built
  * sketches merge counter-wise to the whole-corpus sketch. */
class CountMinSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    // Zipf-ish: value k appears ~60/k times, across 2 shards
    (1 to 30).flatMap { k =>
      (0 until (60 / k)).map(j => (s"v$k", if (j % 2 == 0) "a" else "b"))
    }.toDF("v", "shard")
  }

  test("est >= true for every value, and exact when w >> distinct") {
    val rows = CatStats.countMinErr(fixture, "v", d = 4, w = 4096,
        topK = 30).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getBoolean(4)), "lower_ok must always hold")
    // 30 distinct values into 4096 buckets: no collisions expected
    assert(rows.forall(r => r.getLong(3) == 0L),
      "w >> distinct should estimate exactly")
    // top row is the heaviest value with its exact count
    assert(rows.head.getString(0) == "v1" && rows.head.getLong(1) == 60L)
  }

  test("a tiny sketch genuinely overestimates but never " +
      "underestimates") {
    val rows = CatStats.countMinErr(fixture, "v", d = 2, w = 2,
        topK = 30).collect()
    assert(rows.forall(_.getBoolean(4)), "lower_ok must always hold")
    assert(rows.exists(_.getLong(3) > 0L),
      "2 buckets over 30 values must collide somewhere")
  }

  test("per-shard sketches merge counter-wise to the whole sketch") {
    val rows = CatStats.countMinMergeCheck(fixture, "v", "shard")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(4)),
      "every (row, bucket) counter must match after the merge")
    // total mass per sketch row = corpus size
    val n = fixture.count()
    val mass = rows.groupBy(_.getLong(0))
      .map { case (_, rs) => rs.map(_.getLong(2)).sum }
    assert(mass.forall(_ == n), s"per-row mass $mass != $n")
  }
}
