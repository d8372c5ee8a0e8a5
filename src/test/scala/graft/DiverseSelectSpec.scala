package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Diversity-aware cell selection: one best-quality member per
  * Voronoi cell, deterministic ties, map-only assignment. */
class DiverseSelectSpec extends SparkSpec {

  import spark.implicits._

  test("diverseByCell picks the best-quality member of every cell, " +
      "covers all non-empty cells once, ties break to lower id") {
    // 3 planted clusters around orthogonal-ish 4-dim anchors; ids
    // 0,1,2 are the seed rows (the anchors themselves)
    val anchors = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f))
    val rows = (0L until 30L).map { id =>
      val a = anchors((id % 3).toInt)
      // small deterministic perturbation keeps membership planted
      val v = a.zipWithIndex.map { case (x, i) =>
        x + ((id * 7 + i) % 5).toFloat * 0.01f }
      (id, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    // quality: id 9 gets the top score in its cluster (cluster 0);
    // ids 10 and 13 TIE at the top of cluster 1 → lower id 10 wins
    val quality = (0L until 30L).map { id =>
      val q = if (id == 9L) 100.0
        else if (id == 10L || id == 13L) 90.0
        else 10.0 + (id % 3).toDouble
      (id, q)
    }.toDF("doc_id", "q")
    val sel = Sampling.diverseByCell(emb, "vec_id", "embedding",
      quality, "doc_id", "q", 0L, 3L, dim = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(sel.keySet === Set(0L, 1L, 2L))
    // every cluster has 10 members
    assert(sel.values.map(_._3).toSeq.sorted === Seq(10L, 10L, 10L))
    assert(sel(0L)._1 === 9L, "cluster 0 winner is the quality peak")
    assert(sel(0L)._2 === 100.0)
    assert(sel(1L)._1 === 10L, "tie at 90.0 breaks to the lower id")
    // cluster 2: all members at quality 12.0 (id%3==2) → lowest id 2
    assert(sel(2L)._1 === 2L)
  }

  test("diverseByCell plan is join + single aggregation — no window, " +
      "no cross product") {
    val emb = (0L until 50L).map(id =>
      (id, Seq.tabulate(4)(i => (id % 5 + i).toFloat)))
      .toDF("vec_id", "embedding")
    val q = (0L until 50L).map(id => (id, id.toDouble))
      .toDF("doc_id", "q")
    val plan = Sampling.diverseByCell(emb, "vec_id", "embedding",
      q, "doc_id", "q", 0L, 5L, dim = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window operator")
    assert(!plan.contains("CartesianProduct"), "no cross product")
  }
}
