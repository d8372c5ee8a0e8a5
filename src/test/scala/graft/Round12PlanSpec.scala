package graft

import org.apache.spark.sql.functions._
import graft.ops.{CatStats, UnigramLm}

/** Plan-shape asserts for the round-12 continuation operators: the
  * shapes the scale measurements rely on are pinned so a refactor
  * that quietly reintroduces a window / cartesian / corpus-sized
  * shuffle fails here, not at 100 TB. */
class Round12PlanSpec extends SparkSpec {

  test("tfidfTopK is window-free: the rank head is the bounded heap") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = graft.ops.TextStats.tfidfTopK(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"tfidf must not rank through a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      "the TopKByScoreStr heap aggregate must be in the plan")
  }

  test("unigram segment broadcasts the vocabulary and plans no " +
      "cartesian product") {
    val s = spark
    import s.implicits._
    val words = Seq(("ab", 2L)).toDF("word", "cnt")
    val vocab = Seq(("a", 1L, -1.0), ("b", 1L, -1.0),
      ("ab", 1L, -0.5)).toDF("piece", "cnt", "logp")
    val plan = UnigramLm.segment(words, vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"),
      s"vocab must ride a broadcast:\n$plan")
  }

  test("countMinErr plans no cartesian product (the 1-row total is " +
      "a broadcast)") {
    val s = spark
    import s.implicits._
    val df = Seq("a", "a", "b").toDF("v")
    val plan = CatStats.countMinErr(df, "v", d = 2, w = 4, topK = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hits plans no cartesian product; the L1 totals broadcast") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val plan = graft.ops.GraphOps.hits(edges, "src", "dst", iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
